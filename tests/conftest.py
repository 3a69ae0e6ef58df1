"""Shared fixtures.  Ray is initialised ONCE per pytest session (driver
instruction); oracle-only tests never touch the fixture."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def hmm_model():
    """Conformance HMM fit on the deterministic corpus (cached per session)."""
    from kgforge.oracle.pipeline import train_hmm

    return train_hmm(n_train=800, seed=42)


@pytest.fixture(scope="session")
def small_docs():
    from kgforge.oracle.corpus import generate_interleaved_docs

    return generate_interleaved_docs(120, seed=42)
