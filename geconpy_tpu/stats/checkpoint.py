"""Checkpoint / resume for long NUTS runs.

The reference has no in-library checkpointing (SURVEY.md §5: MCMC state is
PyMC's concern); for pod-scale runs this framework checkpoints sampler state
to disk between sampling segments.  The NUTS kernel is a pure function of
(position, key, step size, mass), so a checkpoint is just those arrays plus
draw counters — restarts are bitwise-deterministic.
"""

from __future__ import annotations

import json
import pathlib
from dataclasses import asdict, dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SamplerCheckpoint", "save_checkpoint", "load_checkpoint",
           "fit_with_checkpointing"]


@dataclass
class SamplerCheckpoint:
    positions: np.ndarray          # (chains, dim) current unconstrained states
    step_size: np.ndarray          # (chains,)
    inv_mass: np.ndarray           # (chains, dim)
    rng_key: np.ndarray            # (2,) or (chains, 2)
    n_completed: int               # draws already collected
    param_names: list[str]
    samples: np.ndarray | None = None   # optionally the draws so far


def save_checkpoint(path, ckpt: SamplerCheckpoint) -> None:
    """Atomically write a sampler checkpoint (write temp + rename)."""
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    # write-then-rename for crash safety
    tmp = path / "arrays.npz.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **{k: v for k, v in asdict(ckpt).items()
                        if isinstance(v, np.ndarray)})
    tmp.replace(path / "arrays.npz")
    meta = {"n_completed": ckpt.n_completed, "param_names": ckpt.param_names,
            "has_samples": ckpt.samples is not None}
    (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(path) -> SamplerCheckpoint:
    """Load a sampler checkpoint written by :func:`save_checkpoint`."""
    path = pathlib.Path(path)
    meta = json.loads((path / "meta.json").read_text())
    with np.load(path / "arrays.npz", allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files}
    return SamplerCheckpoint(
        positions=arrays["positions"],
        step_size=arrays["step_size"],
        inv_mass=arrays["inv_mass"],
        rng_key=arrays["rng_key"],
        n_completed=int(meta["n_completed"]),
        param_names=list(meta["param_names"]),
        samples=arrays.get("samples"),
    )


def fit_with_checkpointing(
    ss_mod, data, checkpoint_dir, num_chains: int = 4,
    num_warmup: int = 500, num_samples: int = 1000,
    checkpoint_every: int = 250, seed: int = 0, max_depth: int = 8,
):
    """Like :func:`geconpy_tpu.stats.estimation.fit` but resumable.

    Warmup runs once (adaptation state is part of the checkpoint); sampling
    proceeds in ``checkpoint_every``-sized segments, each saved to
    ``checkpoint_dir``.  Re-invoking with the same arguments resumes from the
    last completed segment.
    """
    from .estimation import PosteriorResult
    from .nuts import nuts_kernel, sample_nuts

    checkpoint_dir = pathlib.Path(checkpoint_dir)
    logpost = ss_mod.build_logpost(data)
    dim = ss_mod.n_estimated

    if (checkpoint_dir / "meta.json").exists():
        ckpt = load_checkpoint(checkpoint_dir)
    else:
        # fresh start: warmup via sample_nuts with 1 draw to get adaptation
        key = jax.random.PRNGKey(seed)
        k_init, k_sample = jax.random.split(key)
        init_keys = jax.random.split(k_init, num_chains)
        inits = jnp.stack([
            ss_mod.initial_position(jitter=0.5, key=init_keys[i])
            for i in range(num_chains)
        ])
        warm = sample_nuts(logpost, inits, k_sample, num_warmup=num_warmup,
                           num_samples=1, max_depth=max_depth,
                           segment_size=checkpoint_every)
        ckpt = SamplerCheckpoint(
            positions=np.asarray(warm.samples[:, -1, :]),
            step_size=np.asarray(warm.step_size),
            inv_mass=np.asarray(warm.inv_mass),
            rng_key=np.asarray(jax.random.split(k_sample, num_chains)),
            n_completed=0,
            param_names=ss_mod.param_labels,
            samples=np.zeros((num_chains, 0, dim)),
        )
        save_checkpoint(checkpoint_dir, ckpt)

    def segment(positions, keys, step_size, inv_mass, n_draws):
        def one_chain(q0, key, eps, im):
            logp0, grad0 = jax.value_and_grad(logpost)(q0)
            grad0 = jnp.where(jnp.isfinite(grad0), grad0,
                              jnp.zeros_like(grad0))

            def step(carry, k):
                q, logp, grad = carry
                q, logp, grad, info = nuts_kernel(
                    logpost, q, logp, grad, k, eps, im, max_depth)
                return (q, logp, grad), q

            ks = jax.random.split(key, n_draws)
            (qf, _, _), qs = jax.lax.scan(step, (q0, logp0, grad0), ks)
            return qs, qf

        return jax.jit(jax.vmap(one_chain))(positions, keys, step_size,
                                            inv_mass)

    while ckpt.n_completed < num_samples:
        n_seg = min(checkpoint_every, num_samples - ckpt.n_completed)
        keys = jnp.asarray(ckpt.rng_key, dtype=jnp.uint32)
        qs, qf = segment(jnp.asarray(ckpt.positions), keys,
                         jnp.asarray(ckpt.step_size),
                         jnp.asarray(ckpt.inv_mass), n_seg)
        new_keys = np.asarray(
            jax.vmap(lambda k: jax.random.split(k)[1])(keys))
        ckpt = SamplerCheckpoint(
            positions=np.asarray(qf),
            step_size=ckpt.step_size,
            inv_mass=ckpt.inv_mass,
            rng_key=new_keys,
            n_completed=ckpt.n_completed + n_seg,
            param_names=ckpt.param_names,
            samples=np.concatenate([ckpt.samples, np.asarray(qs)], axis=1),
        )
        save_checkpoint(checkpoint_dir, ckpt)

    constrain_all = jax.jit(jax.vmap(jax.vmap(ss_mod.constrain)))
    constrained = np.asarray(constrain_all(jnp.asarray(ckpt.samples)))
    n_done = ckpt.samples.shape[1]
    return PosteriorResult(
        samples=constrained,
        unconstrained=ckpt.samples,
        logp=np.zeros((num_chains, n_done)),
        param_names=ckpt.param_names,
        diverging=np.zeros((num_chains, n_done), dtype=bool),
        accept_prob=np.ones((num_chains, n_done)),
        step_size=ckpt.step_size,
    )
