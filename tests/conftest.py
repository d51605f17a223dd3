import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # Ray's streaming executor does NOT preserve block order by default:
    # under CPU contention take_all() can interleave blocks and any
    # positional row assertion flakes (observed once in a contended
    # test_stages_over_ray run). Engine paths sort explicitly and never
    # rely on this; pinning it here makes the SUITE deterministic.
    ctx.execution_options.preserve_order = True
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sonnets_corpus_dir(tmp_path_factory):
    """F2 sonnets-analog corpus written as a 2-file parquet dir."""
    import pyarrow.parquet as pq

    from ts_type_filter_ray.sources.synthetic import sonnets_corpus_table

    d = tmp_path_factory.mktemp("sonnets_corpus")
    t = sonnets_corpus_table()
    pq.write_table(t.slice(0, 80), str(d / "part-00000.parquet"),
                   row_group_size=32)
    pq.write_table(t.slice(80), str(d / "part-00001.parquet"),
                   row_group_size=32)
    return str(d)


@pytest.fixture(scope="session")
def small_code_corpus_dir(tmp_path_factory):
    """F1 synthetic code corpus, small scale."""
    from ts_type_filter_ray.sources.synthetic import generate_corpus

    d = tmp_path_factory.mktemp("code_corpus")
    generate_corpus(str(d), num_docs=600, seed=42, num_files=4)
    return str(d)
