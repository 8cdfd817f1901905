"""Scoped 32-bit tracing for Pallas kernels inside x64 processes.

Every kernel in ``ops/`` is written for 4-byte words (f32 data, int32
scalars). Under ``jax_enable_x64`` the trace-time semantics shift —
``pl.program_id`` comes out int64, weak Python ints promote to int64 —
and this Mosaic version cannot lower i64→i32 converts (its
``_convert_helper`` recurses on them). The mixed-precision f64 tier
(``ParallelSparseLU.make_f64_ldiv``) runs the f32 fused kernel inside an
x64 process, so kernel call sites wrap tracing in :func:`x64_off`: the
kernel body traces with 32-bit defaults while the surrounding f64
residual arithmetic is untouched (existing f64 tracers keep their dtype;
the scope only changes defaults for values created inside it).

Uses the config-State context manager from ``jax._src.config`` (the
public ``jax.experimental.enable_x64``/``disable_x64`` managers were
removed); degrades to a no-op scope if that private surface moves —
correct whenever the process is not in x64 mode, which is the only case
the scope is needed for anyway.
"""

from __future__ import annotations

import contextlib

__all__ = ["x64_off", "x64_off_for"]

try:
    from jax._src.config import enable_x64 as _enable_x64_state

    def x64_off():
        """Context manager: trace enclosed ops with 32-bit defaults."""
        return _enable_x64_state(False)

except Exception:  # pragma: no cover - jax internal surface moved

    @contextlib.contextmanager
    def x64_off():
        yield


@contextlib.contextmanager
def x64_off_for(dtype):
    """32-bit trace scope ONLY for 4-byte-word kernels. Kernels that
    legitimately carry f64 data (e.g. the PCR scan in interpret mode on
    CPU) must keep 64-bit semantics — weak literals like a ``1.0`` fill
    would otherwise become f32 and fail the f64 ref store."""
    import numpy as np

    if np.dtype(dtype).itemsize <= 4:
        with x64_off():
            yield
    else:
        yield
