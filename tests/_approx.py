"""Julia-`isapprox` comparison, as used by the reference suite.

The reference's checks are `@test isapprox(x, expected; rtol=tol, atol=tol)`
(/root/reference/test/runtests.jl:51,:120,...). For arrays Julia's isapprox
is NORM-wise: ``norm(x - y) <= max(atol, rtol * max(norm(x), norm(y)))`` —
not elementwise like numpy's assert_allclose. This helper reproduces that
exactly so our tolerance bars match the reference's, no looser, no tighter.
"""

import numpy as np


def assert_isapprox(x, y, *, rtol: float, atol: float, msg: str = ""):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    assert x.shape == y.shape, f"shape mismatch {x.shape} vs {y.shape} {msg}"
    diff = np.linalg.norm((x - y).ravel())
    bound = max(atol, rtol * max(np.linalg.norm(x.ravel()), np.linalg.norm(y.ravel())))
    assert diff <= bound, (
        f"isapprox failed: ||x-y||={diff:.3e} > {bound:.3e} "
        f"(rtol={rtol}, atol={atol}) {msg}"
    )
