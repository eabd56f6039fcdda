import numpy as np
import pytest

from geconpy_tpu.stats.checkpoint import (
    SamplerCheckpoint,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    ckpt = SamplerCheckpoint(
        positions=np.random.default_rng(0).normal(size=(4, 3)),
        step_size=np.array([0.1, 0.2, 0.1, 0.15]),
        inv_mass=np.ones((4, 3)),
        rng_key=np.array([[0, 1], [2, 3], [4, 5], [6, 7]], dtype=np.uint32),
        n_completed=250,
        param_names=["a", "b", "c"],
        samples=np.zeros((4, 250, 3)),
    )
    save_checkpoint(tmp_path / "ckpt", ckpt)
    back = load_checkpoint(tmp_path / "ckpt")
    np.testing.assert_array_equal(back.positions, ckpt.positions)
    np.testing.assert_array_equal(back.rng_key, ckpt.rng_key)
    assert back.n_completed == 250
    assert back.param_names == ["a", "b", "c"]
    assert back.samples.shape == (4, 250, 3)


def test_fit_with_checkpointing_resumes(tmp_path):
    """Segmented sampling writes checkpoints and resumes to completion."""
    import jax
    import jax.numpy as jnp

    from geconpy_tpu.stats.checkpoint import fit_with_checkpointing

    class TinyTarget:
        """Duck-typed stand-in for DSGEStateSpace with a Gaussian target."""

        n_estimated = 2
        param_labels = ["a", "b"]

        def build_logpost(self, data):
            def logpost(u):
                return -0.5 * jnp.sum(u**2)

            return logpost

        def initial_position(self, jitter=0.0, key=None):
            u = jnp.zeros(2)
            if jitter and key is not None:
                u = u + jitter * jax.random.normal(key, (2,))
            return u

        def constrain(self, u):
            return u

    target = TinyTarget()
    res = fit_with_checkpointing(
        target, data=None, checkpoint_dir=tmp_path / "run",
        num_chains=2, num_warmup=100, num_samples=60, checkpoint_every=25,
        seed=0, max_depth=5)
    assert res.samples.shape == (2, 60, 2)
    flat = res.samples.reshape(-1, 2)
    assert abs(flat.mean()) < 0.35
    # checkpoint exists and records completion
    back = load_checkpoint(tmp_path / "run")
    assert back.n_completed == 60

    # resuming a finished run is a no-op returning the same draws
    res2 = fit_with_checkpointing(
        target, data=None, checkpoint_dir=tmp_path / "run",
        num_chains=2, num_warmup=100, num_samples=60, checkpoint_every=25,
        seed=0, max_depth=5)
    np.testing.assert_array_equal(res.samples, res2.samples)


def test_crash_mid_write_leaves_previous_checkpoint_loadable(tmp_path):
    """save_checkpoint is write-temp-then-rename: a crash that dies after
    creating the temp file (before the rename) must not corrupt the last
    complete checkpoint."""
    import numpy as np

    from geconpy_tpu.stats.checkpoint import (SamplerCheckpoint,
                                              load_checkpoint,
                                              save_checkpoint)

    ckpt = SamplerCheckpoint(
        positions=np.ones((2, 3)), step_size=np.full(2, 0.1),
        inv_mass=np.ones((2, 3)), rng_key=np.zeros((2, 2), np.uint32),
        n_completed=7, param_names=["a", "b", "c"],
        samples=np.zeros((2, 7, 3)))
    save_checkpoint(tmp_path, ckpt)

    # simulated crash: a half-written temp file from a dead process
    (tmp_path / "arrays.npz.tmp").write_bytes(b"\x00garbage")

    loaded = load_checkpoint(tmp_path)
    assert loaded.n_completed == 7
    np.testing.assert_array_equal(loaded.positions, ckpt.positions)
    assert loaded.param_names == ["a", "b", "c"]


def test_checkpoint_roundtrip_without_samples(tmp_path):
    import numpy as np

    from geconpy_tpu.stats.checkpoint import (SamplerCheckpoint,
                                              load_checkpoint,
                                              save_checkpoint)

    ckpt = SamplerCheckpoint(
        positions=np.ones((1, 2)), step_size=np.full(1, 0.2),
        inv_mass=np.ones((1, 2)), rng_key=np.zeros((1, 2), np.uint32),
        n_completed=0, param_names=["x", "y"], samples=None)
    save_checkpoint(tmp_path, ckpt)
    loaded = load_checkpoint(tmp_path)
    assert loaded.samples is None
    assert loaded.rng_key.dtype == np.uint32
