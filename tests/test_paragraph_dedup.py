"""Cross-document paragraph dedup with reassembly (MassiveText A.2.3
semantics) — hand-computed goldens for both paragraph definitions
(separator regex and delimiter-free word blocks) and the edge cases a
corpus pass hits: intra-doc repeats, fully-duplicated docs, empty docs.
"""

from __future__ import annotations

from rainforest_spark.operators.dedup import paragraph_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


# ------------------------------------------------------- separator mode

def test_separator_mode_keeps_first_occurrence(spark):
    d = _docs(spark, [
        (0, "alpha beta\n\nshared boiler\n\ngamma"),
        (1, "shared boiler\n\ndelta"),
        (2, "shared boiler"),
    ])
    out = _by_id(paragraph_dedup(d, "doc_id", "text", sep=r"\n\n+"))
    # doc 0 holds the first occurrence -> keeps everything
    assert out[0]["n_paras"] == 3 and out[0]["n_kept"] == 3
    assert out[0]["cleaned"] == "alpha beta\n\nshared boiler\n\ngamma"
    # later docs lose the shared paragraph
    assert out[1]["n_kept"] == 1 and out[1]["cleaned"] == "delta"
    # a doc that was ONLY the duplicate reassembles to empty
    assert out[2]["n_paras"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["cleaned"] == ""


def test_separator_mode_intra_doc_repeat_dropped(spark):
    d = _docs(spark, [(7, "x y\n\nx y\n\nz")])
    out = _by_id(paragraph_dedup(d, "doc_id", "text", sep=r"\n\n+"))
    assert out[7]["n_paras"] == 3
    assert out[7]["n_kept"] == 2
    assert out[7]["cleaned"] == "x y\n\nz"


def test_separator_custom_joiner(spark):
    d = _docs(spark, [(1, "p\n\nq")])
    out = _by_id(paragraph_dedup(d, "doc_id", "text", sep=r"\n\n+",
                                 join_with=" | "))
    assert out[1]["cleaned"] == "p | q"


# ----------------------------------------------------------- block mode

def test_block_mode_blocks_and_tail(spark):
    # 5 words, block_words=2 -> blocks "a b", "c d", "e"
    d = _docs(spark, [(0, "a b c d e")])
    out = _by_id(paragraph_dedup(d, "doc_id", "text", block_words=2))
    assert out[0]["n_paras"] == 3
    assert out[0]["n_kept"] == 3
    assert out[0]["cleaned"] == "a b c d e"


def test_block_mode_cross_doc_first_occurrence(spark):
    # "c d" occurs in doc 0 (block 1) and doc 1 (block 0): doc 0 wins
    # by (id, pos); doc 1 keeps only its non-shared block.
    d = _docs(spark, [
        (0, "a b c d"),
        (1, "c d z w"),
        (2, "c d"),
    ])
    out = _by_id(paragraph_dedup(d, "doc_id", "text", block_words=2))
    assert out[0]["cleaned"] == "a b c d"
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["cleaned"] == "z w"
    assert out[2]["n_kept"] == 0 and out[2]["cleaned"] == ""


def test_block_mode_normalization_collapses_case_and_space(spark):
    # normalized stream: "A  b" == "a b" -> doc 1's block is a dup
    d = _docs(spark, [(0, "A  b"), (1, "a b")])
    out = _by_id(paragraph_dedup(d, "doc_id", "text", block_words=2))
    assert out[0]["n_kept"] == 1
    assert out[1]["n_kept"] == 0


def test_empty_doc_survives_with_zero_counts(spark):
    d = _docs(spark, [(0, "a b"), (1, ""), (2, "   ")])
    out = _by_id(paragraph_dedup(d, "doc_id", "text", block_words=2))
    assert len(out) == 3
    for i in (1, 2):
        assert out[i]["n_paras"] == 0
        assert out[i]["n_kept"] == 0
        assert out[i]["cleaned"] == ""
