"""Session-scoped Ray for all tests — init ONCE, shut down at teardown."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def testzone_docs():
    """The reference conformance corpus as an interleaved docs table."""
    from osmi_addresses_ray.sources.testzone import load_osm_xml

    return load_osm_xml("/root/reference/test/osmi-testzone.osm")


@pytest.fixture(scope="session")
def testzone_parsed(testzone_docs):
    from osmi_addresses_ray.stages.parse import parse_docs_batch

    return parse_docs_batch(testzone_docs)
