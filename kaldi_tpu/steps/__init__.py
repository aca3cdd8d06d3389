"""Training/decoding pipeline drivers — the in-process equivalents of the
reference's egs/wsj/s5/steps shell scripts (SURVEY.md §2.10). Instead of
job arrays exchanging .acc files over NFS, each step is a Python driver
whose inner loops are batched jit programs; data parallelism reduces
sufficient statistics with psum on the mesh (SURVEY.md §2.11)."""
