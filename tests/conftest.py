import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per the repo contract:
    never init per-test)."""
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def resources():
    """Corrector side data + resources, built once."""
    from ocr_corrector_ray import datagen
    from ocr_corrector_ray.correct import build_resources

    kws, inv, _ = datagen.static_tables()
    return build_resources(
        datagen.build_char_meta(), kws, datagen.confusion_rev(), inv
    )


@pytest.fixture(scope="session")
def cfg():
    from ocr_corrector_ray.correct import CorrectorConfig

    return CorrectorConfig()
