"""Native C++ text formatter: byte parity with the numpy path + speed."""

import numpy as np
import pytest

from cfd_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no g++ / native lib unavailable")


def _numpy_scalar(a, literal=None):
    rows = np.char.mod("%.6f", a.ravel())
    if literal is not None:
        rows = np.where(literal.ravel(), "0.0", rows)
    return "\n".join(rows) + "\n"


def _numpy_vector(u, v, literal=None):
    su = np.char.mod("%.6f", u.ravel())
    sv = np.char.mod("%.6f", v.ravel())
    rows = np.char.add(np.char.add(su, " "), np.char.add(sv, " 0.0"))
    if literal is not None:
        rows = np.where(literal.ravel(), "0.0 0.0 0.0", rows)
    return "\n".join(rows) + "\n"


def test_scalar_byte_parity_random():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.standard_normal(1000) * 10.0 ** rng.integers(-8, 6, 1000).astype(float),
        [0.0, -0.0, -1e-9, 1e-9, 123456.4999995, -123456.4999995, 0.0000005],
    ])
    assert native.fmt_scalar_fixed6(x) == _numpy_scalar(x)


def test_scalar_with_literal_mask():
    x = np.array([1.5, 2.5, -3.25, 0.0])
    m = np.array([False, True, False, True])
    assert native.fmt_scalar_fixed6(x, m) == _numpy_scalar(x, m)


def test_vector_byte_parity():
    rng = np.random.default_rng(1)
    u = rng.standard_normal(500)
    v = rng.standard_normal(500) * 1e-7
    m = rng.random(500) < 0.3
    assert native.fmt_vector_fixed6(u, v) == _numpy_vector(u, v)
    assert native.fmt_vector_fixed6(u, v, m) == _numpy_vector(u, v, m)


def test_native_is_faster_at_scale():
    import time

    rng = np.random.default_rng(2)
    x = rng.standard_normal(1_000_000)

    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f(x)
            ts.append(time.perf_counter() - t0)
        return min(ts)  # min-of-N is robust to concurrent machine load

    assert best(native.fmt_scalar_fixed6) < best(_numpy_scalar)


def test_huge_values_no_overflow():
    """|x| >= ~1e32 overflows the 40-byte common-case slot; the wrapper must
    retry at worst-case sizing, not corrupt the buffer (round-1 advisor
    finding: the cursor advanced by snprintf's would-be length)."""
    x = np.array([1e40, -1e40, 3.0, 1.7e308, -1.7e308, 0.5])
    out = native.fmt_scalar_fixed6(x)
    assert out == _numpy_scalar(x)
    u = np.array([1e300, 2.0])
    v = np.array([-1e300, 4.0])
    assert native.fmt_vector_fixed6(u, v) == _numpy_vector(u, v)


def test_huge_values_with_mask_mixed():
    x = np.array([1e100, 1e100, -2.5])
    m = np.array([False, True, False])
    assert native.fmt_scalar_fixed6(x, m) == _numpy_scalar(x, m)
