import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_stream(tmp_path_factory):
    """A small deterministic stream shared across Ray tests."""
    from mysql_binlog_ray.fixtures.generator import StreamSpec, generate_stream

    spec = StreamSpec(n_keys=250, n_ops=1200, n_shards=3)
    out = str(tmp_path_factory.mktemp("stream"))
    manifest = generate_stream(spec, out)
    return spec, out, manifest
