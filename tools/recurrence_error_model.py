"""Attribute the plain-f32 Wigner recurrence's top-band error.

Simulates the scaled spin-0 three-term recurrence (the Pallas kernel's
bulk loop, pallas_sht._kernel) in numpy at lmax=3000 under four
arithmetic models:

  plain   — f32 carry, coefficients computed in f32 (rsqrt path), as
            the plain kernel does;
  exact_c — f32 carry, coefficients = f64 values rounded to f32 (what a
            host-precomputed coefficient table's hi plane gives);
  sloppy  — exact_c hi stream + a lo correction stream fed by the
            coefficient lo planes (c_f64 - f32(c_f64)) and the carry lo
            parts, renormalized (two_sum) once per 8 steps — the
            candidate cheap high-accuracy kernel;
  dd      — full double-single (reference arithmetic, ~_kernel_dd).

Error of each vs the f64 recurrence, max over rings, reported per
l-band.  This decides whether a host coefficient table + sloppy lo
stream can reach the <=1e-5 band error (i.e. whether the plain error is
dominated by systematic coefficient rounding rather than carry product
rounding).

Run: python tools/recurrence_error_model.py
"""

import json

import numpy as np

SCALE_LOG2 = 60
SCALE = np.float32(2.0**60)
INV_SCALE = np.float32(2.0**-60)

f32 = np.float32


def seed_value(m, x):
    """log |d^m_{-m,0}| = log C + m*(log cos(t/2) + log sin(t/2)), f64."""
    from scipy.special import gammaln  # available? if not, use lgamma loop

    logc = 0.5 * (gammaln(2 * m + 2) - np.log(4.0 * np.pi)) - (
        0.5 * np.log(2.0) * 0 + gammaln(m + 1)
    )
    # d^m_{-m,0}(t) = sqrt((2m+1)!/(4pi)) / (2^m m!) * (sin t)^m ... use
    # the standard seed: C = sqrt((2m+1)/(4pi) * binom(2m, m)) / 2^m
    raise SystemExit("unused")


def run(lmax=3000, nx=96, ms=(2950, 2700, 2400, 1800, 1000, 200),
        renorm_every=8):
    rng = np.random.default_rng(0)
    # ring positions: HEALPix-like spread incl. near-pole and equator
    x64 = np.sort(np.concatenate([
        rng.uniform(-0.999, 0.999, nx - 8),
        [0.0, 0.01, -0.01, 0.5, -0.5, 0.95, -0.95, 0.999],
    ]))
    xh = x64.astype(f32)
    xl = (x64 - xh.astype(np.float64)).astype(f32)

    report = {}
    for m in ms:
        # -- f64 truth ----------------------------------------------------
        # seed the scaled recurrence at l=m with mantissa 1.0 (the real
        # seed magnitude only scales everything; error growth is what we
        # measure, so a unit seed is equivalent)
        d_prev = np.zeros_like(x64)
        d_curr = np.ones_like(x64)
        k = np.zeros_like(x64)

        # per-variant state: (d_prev, d_curr, k[, lo parts])
        p32 = (np.zeros_like(xh), np.ones_like(xh), np.zeros_like(xh))
        e32 = (np.zeros_like(xh), np.ones_like(xh), np.zeros_like(xh))
        s32 = (np.zeros_like(xh), np.zeros_like(xh),
               np.ones_like(xh), np.zeros_like(xh), np.zeros_like(xh))
        dd = (np.zeros_like(xh), np.zeros_like(xh),
              np.ones_like(xh), np.zeros_like(xh), np.zeros_like(xh))

        bands = {}
        for ell in range(m + 1, lmax + 1):
            l_f64 = float(ell)
            a_l64 = np.sqrt(l_f64**2 - m * m)
            a_lm164 = np.sqrt((l_f64 - 1) ** 2 - m * m)
            c1_64 = (2 * l_f64 - 1) / a_l64
            c2_64 = a_lm164 / a_l64

            # truth step
            d_new = c1_64 * (x64 * d_curr) - c2_64 * d_prev
            d_prev, d_curr = d_curr, d_new
            over = np.abs(d_curr) > float(SCALE)
            sc = np.where(over, float(INV_SCALE), 1.0)
            d_prev, d_curr, k = d_prev * sc, d_curr * sc, k + over

            # plain f32: coefficients via f32 ops (mimic kernel rsqrt)
            lf = f32(ell)
            m2 = f32(m) * f32(m)
            a_l = np.sqrt(np.maximum(lf * lf - m2, f32(0)))
            a_lm1 = np.sqrt(np.maximum((lf - 1) * (lf - 1) - m2, f32(0)))
            inv = f32(1.0) / a_l
            c1p = f32(f32(2 * lf - 1) * inv)
            c2p = f32(a_lm1 * inv)

            # exact-rounded coefficients
            c1h, c2h = f32(c1_64), f32(c2_64)
            c1l = f32(c1_64 - np.float64(c1h))
            c2l = f32(c2_64 - np.float64(c2h))

            def plain_step(st, c1, c2):
                dp, dc, kk = st
                dn = f32(f32(c1 * f32(xh * dc)) - f32(c2 * dp))
                ov = np.abs(dn) > SCALE
                scl = np.where(ov, INV_SCALE, f32(1.0)).astype(f32)
                return (f32(dc * scl), f32(dn * scl),
                        (kk + ov).astype(f32))

            p32 = plain_step(p32, c1p, c2p)
            e32 = plain_step(e32, c1h, c2h)

            # sloppy: hi exactly as exact_c; lo = coefficient-lo terms +
            # carry-lo propagation (plain f32 arithmetic)
            dph, dpl, dch, dcl, kk = s32
            hi_new = f32(f32(c1h * f32(xh * dch)) - f32(c2h * dph))
            lo_new = f32(
                f32(c1h * f32(xh * dcl))
                + f32(f32(c1l * xh) + f32(c1h * xl)) * dch
                - f32(c2h * dpl)
                - f32(c2l * dph)
            )
            ov = np.abs(hi_new) > SCALE
            scl = np.where(ov, INV_SCALE, f32(1.0)).astype(f32)
            s32 = (f32(dch * scl), f32(dcl * scl), f32(hi_new * scl),
                   f32(lo_new * scl), (kk + ov).astype(f32))
            if (ell - m) % renorm_every == 0:
                dph, dpl, dch, dcl, kk = s32
                s = f32(dch + dcl)
                e = f32(dcl - f32(s - dch))
                s2_ = f32(dph + dpl)
                e2_ = f32(dpl - f32(s2_ - dph))
                s32 = (s2_, e2_, s, e, kk)

            # full dd (double-single, simplified via f64 emulation of
            # the pair: hi+lo kept to ~2^-48); implement with exact
            # two_sum/two_prod in f64-free style is tedious — emulate by
            # computing in f64 then re-splitting (upper bound on dd
            # accuracy, matches _kernel_dd's design target)
            dph, dpl, dch, dcl, kk = dd
            v = (c1_64 * (x64 * (dch.astype(np.float64) + dcl))
                 - c2_64 * (dph.astype(np.float64) + dpl))
            hi = v.astype(f32)
            lo = (v - hi.astype(np.float64)).astype(f32)
            ov = np.abs(hi) > SCALE
            scl = np.where(ov, INV_SCALE, f32(1.0)).astype(f32)
            dd = (f32(dch * scl), f32(dcl * scl), f32(hi * scl),
                  f32(lo * scl), (kk + ov).astype(f32))

            if ell % 250 == 0 or ell == lmax:
                def rel(st, lo_idx=None):
                    if len(st) == 3:
                        dp, dc, kk = st
                        val = dc.astype(np.float64)
                    else:
                        _, _, hch, hcl, kk = st
                        val = hch.astype(np.float64) + hcl
                    truth = d_curr
                    dk = kk.astype(np.float64) - k
                    val = val * (2.0 ** (60 * dk))
                    good = np.abs(truth) > np.abs(truth).max() * 1e-8
                    return float(np.max(
                        np.abs(val[good] - truth[good])
                        / np.abs(truth[good])
                    ))

                bands[ell] = dict(
                    plain=rel(p32), exact_c=rel(e32),
                    sloppy=rel(s32), dd=rel(dd),
                )
        report[m] = bands
    return report


if __name__ == "__main__":
    rep = run()
    for m, bands in rep.items():
        print(f"m={m}")
        for ell, r in bands.items():
            print(
                f"  l={ell:5d}  plain {r['plain']:9.2e}  "
                f"exact_c {r['exact_c']:9.2e}  sloppy {r['sloppy']:9.2e}  "
                f"dd {r['dd']:9.2e}"
            )
    with open("tools/recurrence_error_model.json", "w") as f:
        json.dump(rep, f, indent=1)
