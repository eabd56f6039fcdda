"""MCMC convergence diagnostics: split R-hat and effective sample size.

The reference delegates these to ArviZ; here they are small numpy routines
(Vehtari et al. 2021 rank-normalized split-R-hat is approximated by the
classic split-R-hat on the raw draws, which is what the reference's default
reporting used).
"""

from __future__ import annotations

import numpy as np

__all__ = ["split_rhat", "effective_sample_size", "summarize_chains"]


def _split_chains(x: np.ndarray) -> np.ndarray:
    """(chains, draws) -> (2*chains, draws//2)"""
    c, n = x.shape
    half = n // 2
    return np.concatenate([x[:, :half], x[:, half:2 * half]], axis=0)


def split_rhat(x: np.ndarray) -> float:
    """Gelman-Rubin potential scale reduction on split chains.

    x: (chains, draws) for one scalar quantity.
    """
    x = _split_chains(np.asarray(x, dtype=float))
    m, n = x.shape
    chain_means = x.mean(axis=1)
    chain_vars = x.var(axis=1, ddof=1)
    W = chain_vars.mean()
    B = n * chain_means.var(ddof=1)
    var_hat = (n - 1) / n * W + B / n
    if W <= 0:
        return np.inf
    return float(np.sqrt(var_hat / W))


def _autocovariance_fft(x: np.ndarray) -> np.ndarray:
    n = x.shape[-1]
    xc = x - x.mean(axis=-1, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, size, axis=-1)
    acov = np.fft.irfft(f * np.conj(f), size, axis=-1)[..., :n]
    return acov / n


def effective_sample_size(x: np.ndarray) -> float:
    """ESS via the Geyer initial monotone sequence over pooled split chains."""
    x = _split_chains(np.asarray(x, dtype=float))
    m, n = x.shape
    acov = _autocovariance_fft(x)
    chain_var = acov[:, 0] * n / (n - 1)
    mean_var = chain_var.mean()
    var_plus = mean_var * (n - 1) / n + x.mean(axis=1).var(ddof=1)
    if var_plus <= 0:
        return float(m * n)

    rho = 1.0 - (mean_var - acov.mean(axis=0)) / var_plus
    # Geyer: sum consecutive pairs while positive and monotone
    tau = 1.0
    prev_pair = np.inf
    t = 1
    while t + 1 < n:
        pair = rho[t] + rho[t + 1]
        if pair < 0:
            break
        pair = min(pair, prev_pair)
        prev_pair = pair
        tau += 2.0 * pair
        t += 2
    ess = m * n / tau
    return float(min(ess, m * n))


def summarize_chains(samples: np.ndarray, names: list[str] | None = None):
    """samples: (chains, draws, dim) -> per-parameter summary DataFrame."""
    import pandas as pd

    samples = np.asarray(samples)
    c, n, d = samples.shape
    names = names or [f"x{i}" for i in range(d)]
    rows = []
    for i in range(d):
        x = samples[:, :, i]
        flat = x.reshape(-1)
        rows.append({
            "mean": flat.mean(),
            "sd": flat.std(ddof=1),
            "hdi_3%": np.percentile(flat, 3),
            "hdi_97%": np.percentile(flat, 97),
            "ess": effective_sample_size(x),
            "r_hat": split_rhat(x),
        })
    return pd.DataFrame(rows, index=names)
