"""Grid / geometry pipeline: polar→Cartesian lookup joins, weighted
compositing, grid image kernels (SURVEY §7 Phase 4)."""
