"""Double-single contraction + f32 mixing-matrix accuracy regression.

Plain f32 GL quadrature of the mixing matrices loses ~1e-4 of the row
maximum to summation cancellation at production lmax (measured,
tools/mixmat_accuracy.json); these tests pin the compensated df32 path
that replaced it to the f64 oracle.
"""

import numpy as np
import pytest

from heracles_tpu.ops import df32
from heracles_tpu.ops.wigner import wigner_table, wigner_table_host


def test_gram_df32_matches_f64():
    """Pallas (interpret) and scan-ref grams reach ~f64 accuracy."""
    rng = np.random.default_rng(1)
    K, L1, L2 = 192, 17, 23
    # heavy dynamic range stresses both product and summation rounding
    A64 = rng.normal(size=(K, L1)) * np.exp(3 * rng.normal(size=(K, L1)))
    B64 = rng.normal(size=(K, L2)) * np.exp(3 * rng.normal(size=(K, L2)))
    u64 = rng.normal(size=K)
    truth = np.einsum("ka,kb,k->ab", A64, B64, u64)
    scale = np.abs(truth).max()
    args = (df32.split_f64(A64), df32.split_f64(B64), df32.split_f64(u64))

    got = df32.gram_df32(*args, a_tile=8, b_tile=16, k_chunk=64,
                         interpret=True)
    assert np.abs(got - truth).max() / scale < 1e-12

    ref = df32.gram_df32_ref(*args)
    assert np.abs(ref - truth).max() / scale < 1e-8

    plain = np.einsum(
        "ka,kb,k->ab", *(z.astype(np.float32) for z in (A64, B64, u64))
    ).astype(np.float64)
    # sanity: plain f32 is orders of magnitude worse on the same data
    assert np.abs(plain - truth).max() / scale > 1e-8


def test_wigner_table_host_matches_f64_scan():
    rng = np.random.default_rng(2)
    x = np.sort(rng.uniform(-0.999, 0.999, 40))
    theta = np.arccos(x)
    logch = np.log(np.cos(theta / 2))
    logsh = np.log(np.sin(theta / 2))
    lmax = 30
    for m, n in [(0, 0), (2, 2), (-2, -2), (0, 2), (2, -2), (3, 1)]:
        ref = np.asarray(wigner_table(m, n, x, logch, logsh, lmax))
        got = wigner_table_host(m, n, theta, lmax)
        np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("kernel", [False, True])
def test_mixmat_f32_path_matches_f64(kernel, monkeypatch):
    """f32-input mixing matrices agree with the f64 path to ~cl3 ulp.

    kernel=True forces the Pallas df32 kernel (interpret mode) — the
    branch the TPU runs; kernel=False exercises the host-f64 einsum
    fallback for f32 inputs off-TPU.
    """
    from heracles_tpu import twopoint

    if kernel:
        monkeypatch.setenv("HERACLES_TPU_MIXMAT_KERNEL", "interpret")
    rng = np.random.default_rng(7)
    lmax = 32
    cl3 = (1 / (1 + np.arange(2 * lmax + 1)) ** 2.5) * (
        1 + 0.2 * rng.standard_normal(2 * lmax + 1) ** 2
    )
    m64 = np.asarray(
        twopoint.mixmat_eb(cl3, l1max=lmax, l2max=lmax, spin=(2, 2))
    )
    m32 = np.asarray(
        twopoint.mixmat_eb(
            cl3.astype(np.float32), l1max=lmax, l2max=lmax, spin=(2, 2)
        )
    )
    # the floor is the f32 quantisation of cl3 itself (~1e-7 relative)
    for i in range(3):
        scale = np.abs(m64[i]).max()
        assert np.abs(m32[i] - m64[i]).max() / scale < 5e-7

    s64 = twopoint.mixmat(cl3, l1max=lmax, l2max=lmax, spin=(0, 0))
    s32 = twopoint.mixmat(
        cl3.astype(np.float32), l1max=lmax, l2max=lmax, spin=(0, 0)
    )
    assert np.abs(s32 - s64).max() / np.abs(s64).max() < 5e-7


def test_pinv_df32_refinement_beats_f32_floor():
    """df32 Newton-Schulz refinement recovers f64-grade pseudo-inverses."""
    from heracles_tpu.twopoint import _pinv_batch

    rng = np.random.default_rng(3)
    n = 48
    # ill-conditioned SPD-ish matrix: cond ~ 1e5
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    s = np.geomspace(1.0, 1e-5, n)
    a = (q * s) @ q.T
    truth = np.linalg.pinv(a, rcond=1e-7)

    got = _pinv_batch(a[None], 1e-7, refine=True, interpret=True)[0]
    rel = np.abs(got - truth).max() / np.abs(truth).max()
    assert rel < 1e-9, rel

    # contrast: the raw f32 SVD inverse sits at the cond * eps floor
    raw = np.asarray(
        np.linalg.pinv(a.astype(np.float32), rcond=1e-7), np.float64
    )
    raw_rel = np.abs(raw - truth).max() / np.abs(truth).max()
    assert raw_rel > 1e-5
