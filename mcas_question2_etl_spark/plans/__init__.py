"""End-to-end query plans: the flagship analysis query and the benchmark
suite, expressed as composable (spark, sf_dir) -> DataFrame callables."""
