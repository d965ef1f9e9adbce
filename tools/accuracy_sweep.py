"""CPU-f64 vs f32 SHT accuracy sweep — the float32 error budget.

The reference pipeline is float64 end-to-end (ducc epsilon 1e-12,
reference heracles/ducc.py:108-115); the TPU engine runs float32.  This
tool quantifies what that costs, per size:

* draw random band-limited alms (f64, reality conditions enforced);
* synthesize the map in f64 on the host CPU — the "truth" map;
* analyse it back in f64 (CPU) -> the engine's f64 floor;
* analyse the same map in f32 (TPU when available, else CPU f32);
* report max/rms relative alm error and the relative Cl error vs l
  (Cl = per-l mean over m, so random alm errors average down by
  ~1/sqrt(2l+1)).

Each stage runs in its own subprocess (the jax platform is fixed at
init), sharing arrays via .npz files in $HERACLES_TPU_CACHE.  Results
accumulate in tools/accuracy_sweep.json; the STATUS.md table is
generated from it with --table.

Usage:
    python tools/accuracy_sweep.py --nside 512 [--spin 2]
    python tools/accuracy_sweep.py --table
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RESULTS = os.path.join(HERE, "accuracy_sweep.json")
CACHE = os.environ.get("HERACLES_TPU_CACHE", "/tmp/heracles_tpu_cache")


def _alm_key(nside, lmax, spin):
    return f"n{nside}_l{lmax}_s{spin}"


def _make_alms(lmax, spin, seed=0):
    sys.path.insert(0, REPO)
    from heracles_tpu.ops import sht

    rng = np.random.default_rng(seed)
    nlm = sht.alm_size(lmax)
    shape = (2, nlm) if spin else (nlm,)
    # unit-variance alms ~ flat Cl; reality condition on m = 0
    alm = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    ls, ms = sht._pack_index(lmax, lmax)
    alm[..., ms == 0] = alm[..., ms == 0].real
    if spin:
        alm[..., ls < spin] = 0
    return alm


def _stage_synth(nside, lmax, spin, path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, REPO)
    from heracles_tpu.ops import sht

    alm = _make_alms(lmax, spin, seed=nside)
    maps = np.asarray(sht.alm2map(alm, nside, lmax=lmax, spin=spin))
    np.savez(path, alm=alm, maps=maps)
    print(f"synth f64 done: {maps.shape}")


def _parse_dd(dd):
    return dd if dd == "comp" else bool(int(dd or 0))


def _stage_analyse(path, out, lmax, spin, dtype, iters=0, dd=0):
    import jax

    if dtype == "f64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif os.environ.get("HERACLES_TPU_SWEEP_CPU"):
        # f32 stage on the host (same f32 arithmetic modulo FMA details):
        # lets the error budget re-measure while the TPU tunnel is down
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import jax.numpy as jnp  # noqa: F401  (after platform pinning)

    from heracles_tpu.ops import sht

    dd = _parse_dd(dd)
    maps = np.load(path)["maps"]
    if dtype == "f32":
        maps = maps.astype(np.float32)
    back = sht.map2alm_host(maps, lmax=lmax, spin=spin, iterations=iters,
                            dd=dd)
    np.savez(out, back=back)
    print(f"analyse {dtype} iters={iters} dd={dd} done on "
          f"{jax.default_backend()}")


def _stage_synth32(path, out, lmax, spin, dd=0):
    """f32 synthesis of the truth alms (the alm2map error budget's
    device stage; the follow-up f64 analysis converts the map error to
    per-l rows comparable with the analysis-direction ones)."""
    import jax

    if os.environ.get("HERACLES_TPU_SWEEP_CPU"):
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    from heracles_tpu.ops import sht

    dd = _parse_dd(dd)
    data = np.load(path)
    alm = data["alm"].astype(np.complex64)
    nside = int(round(np.sqrt(data["maps"].shape[-1] / 12)))
    maps32 = np.asarray(
        sht.alm2map_host(alm, nside, lmax=lmax, spin=spin, dd=dd)
    )
    np.savez(out, maps=maps32.astype(np.float64))
    print(f"synth f32 dd={dd} done on {jax.default_backend()}")


def _cl_of(alm, lmax):
    sys.path.insert(0, REPO)
    from heracles_tpu.ops import sht

    rect = sht.unpack_alm(np.asarray(alm), lmax)
    m = np.arange(lmax + 1)
    eps = np.where(m == 0, 1.0, 2.0)
    p = (rect.real**2 + rect.imag**2) * eps
    return p.sum(axis=-1) / (2 * np.arange(lmax + 1) + 1)


def _band_max(rel, lmax, nbands=6):
    edges = np.unique(np.geomspace(2, lmax + 1, nbands + 1).astype(int))
    ells = np.arange(rel.shape[-1])
    out = {}
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (ells >= lo) & (ells < hi)
        out[f"{lo}-{hi - 1}"] = float(np.nanmax(rel[..., sel]))
    return out


def run(nside, spin, partial=False, lmax=None):
    if lmax is None:
        lmax = 3 * nside // 2
    key = _alm_key(nside, lmax, spin)
    os.makedirs(CACHE, exist_ok=True)
    base = os.path.join(CACHE, f"acc_{key}")
    env = dict(os.environ)

    def sub(args):
        r = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                           env=env, cwd=REPO)
        if r.returncode:
            raise RuntimeError(f"stage {args} failed")

    if not os.path.exists(base + ".npz"):
        sub(["--stage", "synth", "--nside", str(nside), "--spin", str(spin),
             "--path", base + ".npz", "--lmax", str(lmax)])
    variants = (("f64", "f64", 0, "0"), ("f32", "f32", 0, "0"),
                ("f64_it1", "f64", 1, "0"), ("f32_it1", "f32", 1, "0"),
                ("f32_dd", "f32", 0, "1"), ("f32_dd_it1", "f32", 1, "1"),
                ("f32_comp", "f32", 0, "comp"),
                ("f32_comp_it1", "f32", 1, "comp"))
    if os.environ.get("HERACLES_TPU_SWEEP_CPU"):
        # host-f32 rows are recorded separately from the TPU-f32 rows
        variants = (("f32_cpu", "f32", 0, "0"), ("f32_it1_cpu", "f32", 1, "0"),
                    ("f32_dd_cpu", "f32", 0, "1"))
    for name, dt, it, dd in variants:
        if not os.path.exists(f"{base}_{name}.npz"):
            if partial:
                continue  # report whatever stages exist (f32 needs TPU)
            sub(["--stage", "analyse", "--path", base + ".npz",
                 "--out", f"{base}_{name}.npz", "--lmax", str(lmax),
                 "--spin", str(spin), "--dtype", dt, "--iters", str(it),
                 "--dd", dd])
    # synthesis-direction rows: f32 alm2map on the device, then an f64
    # host analysis turns the map error into per-l rows on the same
    # scale as the analysis-direction ones (the f64 one-pass floor is
    # the "f64" row above)
    synth_variants = (("alm2map_f32", "0"), ("alm2map_f32_dd", "1"),
                      ("alm2map_f32_comp", "comp"))
    if os.environ.get("HERACLES_TPU_SWEEP_CPU"):
        synth_variants = (("alm2map_f32_cpu", "0"),)
    for name, dd in synth_variants:
        mpath = f"{base}_m_{name}.npz"
        if not os.path.exists(f"{base}_{name}.npz") and not partial:
            if not os.path.exists(mpath):
                sub(["--stage", "synth32", "--path", base + ".npz",
                     "--out", mpath, "--lmax", str(lmax),
                     "--spin", str(spin), "--dd", dd])
            sub(["--stage", "analyse", "--path", mpath,
                 "--out", f"{base}_{name}.npz", "--lmax", str(lmax),
                 "--spin", str(spin), "--dtype", "f64", "--iters", "0",
                 "--dd", "0"])
    variants = variants + tuple(
        (name, None, None, None) for name, _ in synth_variants
    )

    truth = np.load(base + ".npz")["alm"]
    scale = np.abs(truth).max()

    cl_t = _cl_of(truth, lmax)
    # merge into any previously-recorded row: a partial re-run (e.g. the
    # f32 stages landing on the TPU after the cache holding the f64
    # analyses was cleaned) must not drop the existing oracle entries
    results = {}
    if os.path.exists(RESULTS):
        results = json.load(open(RESULTS))
    rec = results.get(key, {})
    rec.update({"nside": nside, "lmax": lmax, "spin": spin})
    for name, _, _, _ in variants:
        if not os.path.exists(f"{base}_{name}.npz"):
            continue
        back = np.load(f"{base}_{name}.npz")["back"]
        err = np.abs(back - truth)
        rel_cl = np.abs(_cl_of(back, lmax) - cl_t) / np.where(cl_t > 0, cl_t, 1)
        rec[name] = {
            "alm_max_rel": float(err.max() / scale),
            "alm_rms_rel": float(np.sqrt((err**2).mean()) / scale),
            "cl_max_rel": float(np.nanmax(rel_cl[..., 2:])),
            "cl_band_max_rel": _band_max(rel_cl, lmax),
        }

    results[key] = rec
    json.dump(results, open(RESULTS, "w"), indent=1, sort_keys=True)
    print(json.dumps(rec, indent=1))


def table():
    results = json.load(open(RESULTS))
    print("| nside | lmax | spin | Cl f32 | Cl f64 | Cl f32 it1 "
          "| Cl f64 it1 |")
    print("|---|---|---|---|---|---|---|")
    for key in sorted(results):
        r = results[key]
        def cell(name):
            v = r.get(name, {}).get("cl_max_rel")
            return f"{v:.2e}" if v is not None else "—"

        print(
            f"| {r['nside']} | {r['lmax']} | {r['spin']} "
            f"| {cell('f32')} | {cell('f64')} "
            f"| {cell('f32_it1')} | {cell('f64_it1')} |"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int)
    ap.add_argument("--spin", type=int, default=0)
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--partial", action="store_true",
                    help="report existing stages only (skip missing)")
    ap.add_argument("--stage", choices=["synth", "synth32", "analyse"])
    ap.add_argument("--path")
    ap.add_argument("--out")
    ap.add_argument("--lmax", type=int)
    ap.add_argument("--dtype", choices=["f32", "f64"])
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--dd", default="0",
                    help='accuracy mode: 0, 1 (double-single) or "comp"')
    args = ap.parse_args()
    if args.stage == "synth":
        lmax = args.lmax if args.lmax else 3 * args.nside // 2
        _stage_synth(args.nside, lmax, args.spin, args.path)
    elif args.stage == "synth32":
        _stage_synth32(args.path, args.out, args.lmax, args.spin,
                       dd=args.dd)
    elif args.stage == "analyse":
        _stage_analyse(args.path, args.out, args.lmax, args.spin, args.dtype,
                       args.iters, dd=args.dd)
    elif args.table:
        table()
    else:
        run(args.nside, args.spin, partial=args.partial, lmax=args.lmax)


if __name__ == "__main__":
    main()
