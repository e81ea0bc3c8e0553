from gendr_tpu.ops import distributions, tconorms  # noqa: F401
