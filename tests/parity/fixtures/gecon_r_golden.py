"""gEcon-R golden policy blocks for rbc_2_block_ss — VENDORED ORACLE DATA.

Provenance: numeric output of the R gEcon package (gecon.r-forge.r-project
.org) for the canonical two-block RBC model, as transcribed in the upstream
gEconpy test resources (jessegrabowski/gEconpy,
tests/_resources/expected_matrices.py, entry "rbc_2_block_ss.gcn").  These
numbers are third-party DATA (an external solver's printed solution, ~7
significant digits), vendored so the parity suite is self-contained —
see tests/parity/test_gecon_r_parity.py for the convention bridge.
"""

import numpy as np

RBC_2_BLOCK_SS_GOLDEN = {
    "P": np.array(
[[0.95      , 0.        ],
 [0.08887552, 0.9614003 ]]),
    "Q": np.array(
[[1.        ],
 [0.09355318]]),
    "R": np.array(
[[ 0.3437521,  0.3981261],
 [ 3.5550207, -0.5439888],
 [ 0.1418896, -0.2412174],
 [ 1.0422283,  0.1932087],
 [-0.2127497, -0.1270917],
 [ 1.0422282,  0.1932087],
 [-0.6875042, -0.7962522],
 [-0.6875042, -0.7962522],
 [ 1.0422284, -0.8067914],
 [ 0.9003386,  0.4344261]]),
    "S": np.array(
[[ 0.3618443],
 [ 3.7421271],
 [ 0.1493575],
 [ 1.0970824],
 [-0.2239471],
 [ 1.0970823],
 [-0.7236886],
 [-0.7236886],
 [ 1.0970825],
 [ 0.9477249]]),
    "param_dict": {'beta': 0.985, 'delta': 0.025, 'sigma_C': 2.0, 'sigma_L': 1.5, 'alpha': 0.35, 'rho_A': 0.95},
}
