"""Object-storage artifact fallback (reference
common/object_storage.py:51-67 ``ObjectStorage.check_file``).

The reference resolves model/LUT artifacts local-first and falls back
to an S3-compatible bucket (boto3).  Same semantics here, import-gated
like the other optional native deps (pyart, h5py): ``boto3`` absent →
local resolution still works, the *fallback* raises with the exact
env recipe.  Configuration is env-driven — endpoint
``RAINFOREST_S3_ENDPOINT``, credentials via the standard
``AWS_ACCESS_KEY_ID`` / ``AWS_SECRET_ACCESS_KEY`` — never hardcoded.

Engine note: this resolves DRIVER-SIDE artifacts (trained models,
LUT parquet, config bundles).  Bulk DATA on object storage is read by
Spark itself (``spark.read.parquet("s3a://...")`` with hadoop-aws on
the cluster classpath) — pulling data through the driver would be the
anti-pattern; see SURVEY §2 S18.
"""

from __future__ import annotations

import os

try:
    import boto3
    _HAS_BOTO3 = True
except ImportError:
    _HAS_BOTO3 = False


class ArtifactStore:
    """Local-first artifact resolver with an S3-compatible fallback."""

    def __init__(self, bucket: str = "rainforest",
                 endpoint: str | None = None):
        self.bucket = bucket
        self.endpoint = endpoint or os.environ.get(
            "RAINFOREST_S3_ENDPOINT")
        self._client = None
        if _HAS_BOTO3 and self.endpoint \
                and os.environ.get("AWS_ACCESS_KEY_ID"):
            self._client = boto3.client("s3", endpoint_url=self.endpoint)

    @property
    def available(self) -> bool:
        return self._client is not None

    def check_file(self, filename: str) -> str:
        """Return ``filename`` if it exists locally, else download its
        basename from the bucket into its directory (reference
        check_file semantics); raise ``FileNotFoundError`` with the
        configuration recipe when the fallback is unavailable."""
        if os.path.exists(filename):
            return filename
        if not self.available:
            why = ("boto3 is not installed" if not _HAS_BOTO3 else
                   "RAINFOREST_S3_ENDPOINT / AWS_ACCESS_KEY_ID / "
                   "AWS_SECRET_ACCESS_KEY are not set")
            raise FileNotFoundError(
                f"{filename} not found locally and the object-storage "
                f"fallback is unavailable ({why}).")
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        self._client.download_file(self.bucket,
                                   os.path.basename(filename), filename)
        return filename

    def list_files(self) -> list[str]:
        if not self.available:
            raise RuntimeError("object storage not configured")
        resp = self._client.list_objects_v2(Bucket=self.bucket)
        return [o["Key"] for o in resp.get("Contents", [])]

    def upload_file(self, path: str, key: str | None = None) -> None:
        if not self.available:
            raise RuntimeError("object storage not configured")
        self._client.upload_file(path, self.bucket,
                                 key or os.path.basename(path))
