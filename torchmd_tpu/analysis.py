"""On-device trajectory analysis: RMSD (Kabsch), RDF, MSD.

Self-contained replacement for the reference's moleculekit-based
trajectory viewing (reference scripts/analysis.py:18-24 views frames in
moleculekit, which is unavailable here): the standard structural
observables computed as batched jnp ops, so they run on the accelerator
over whole trajectories at once.

Trajectories are accepted in either the run.py save layout
(natoms, 3, nframes) or frame-major (nframes, natoms, 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _frames(traj):
    """-> (nframes, natoms, 3) float array from either storage layout."""
    traj = jnp.asarray(traj)
    if traj.ndim == 2:
        traj = traj[None]
    if traj.shape[-1] == 3:
        return traj
    if traj.shape[1] == 3:
        return jnp.transpose(traj, (2, 0, 1))
    raise ValueError(f"Unrecognized trajectory shape {traj.shape}")


def kabsch_rotation(P, Q, weights=None):
    """Optimal rotation matrix aligning P onto Q (both centered, (N, 3)),
    via SVD with the det-correction for proper rotations. Computed in
    numpy float64: accelerator f32 SVD is too approximate for RMSD."""
    P = np.asarray(P, np.float64)
    Q = np.asarray(Q, np.float64)
    if weights is None:
        w = np.ones((P.shape[0], 1))
    else:
        w = np.asarray(weights, np.float64).reshape(-1, 1)
    H = (w * P).T @ Q
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    return Vt.T @ D @ U.T


def rmsd(traj, ref=None, weights=None, align=True, sel=None):
    """Per-frame RMSD (Angstrom) to `ref` (default: the first frame).

    align=True removes the optimal rigid-body transform per frame
    (Kabsch); `weights` (e.g. masses) weight both the fit and the RMSD;
    `sel` is an optional atom-index selection. Runs in numpy float64 (3x3
    SVDs; accelerator f32 SVD is too approximate for this)."""
    F = np.asarray(_frames(traj), np.float64)
    if sel is not None:
        F = F[:, np.asarray(sel)]
    if ref is None:
        ref = F[0]
    else:
        ref = np.asarray(_frames(ref), np.float64)[0]
        if sel is not None:
            ref = ref[np.asarray(sel)]
    if weights is None:
        w = np.ones((F.shape[1], 1))
    else:
        w = np.asarray(weights, np.float64).reshape(-1, 1)
    wsum = w.sum()

    refc = ref - (w * ref).sum(0) / wsum
    out = []
    for frame in F:
        p = frame - (w * frame).sum(0) / wsum
        if align:
            R = kabsch_rotation(p, refc, w[:, 0])
            p = p @ R.T
        out.append(np.sqrt(((w * (p - refc) ** 2).sum()) / wsum))
    return np.asarray(out)


def rdf(traj, box, r_max=None, nbins=100, sel_a=None, sel_b=None):
    """Radial distribution function g(r) averaged over frames.

    box: (3,) rectangular box diagonal (required; minimum image applied).
    sel_a / sel_b: index selections for partial RDFs (defaults: all atoms).
    Returns (r_centers, g) numpy arrays."""
    F = _frames(traj)
    box = jnp.asarray(box, F.dtype).reshape(-1)[:3]
    if r_max is None:
        r_max = float(jnp.min(box)) / 2.0
    a = jnp.arange(F.shape[1]) if sel_a is None else jnp.asarray(sel_a)
    b = jnp.arange(F.shape[1]) if sel_b is None else jnp.asarray(sel_b)
    # identical-ATOM pairs must never count, including partially
    # overlapping selections (sel_a a subset of a defaulted sel_b)
    self_pair = np.asarray(a)[:, None] == np.asarray(b)[None, :]
    nself = int(self_pair.sum())
    self_pair_j = jnp.asarray(self_pair)
    edges = jnp.linspace(0.0, r_max, nbins + 1)

    def one(frame):
        dv = frame[a][:, None, :] - frame[b][None, :, :]
        dv = dv - box * jnp.round(dv / box)
        d = jnp.sqrt(jnp.sum(dv * dv, axis=-1))
        d = jnp.where(self_pair_j, r_max * 2.0, d)  # drop self-pairs
        hist = jnp.histogram(d.reshape(-1), bins=edges)[0]
        return hist

    hist = jnp.sum(jax.vmap(one)(F), axis=0).astype(jnp.float64)
    nframes = F.shape[0]
    vol = float(box[0] * box[1] * box[2])
    na, nb = int(a.shape[0]), int(b.shape[0])
    shell = (4.0 / 3.0) * np.pi * (
        np.asarray(edges[1:]) ** 3 - np.asarray(edges[:-1]) ** 3
    )
    npairs = na * nb - nself
    ideal = npairs / vol * shell * nframes
    r = 0.5 * (np.asarray(edges[1:]) + np.asarray(edges[:-1]))
    return r, np.asarray(hist) / np.maximum(ideal, 1e-12)


def msd(traj, sel=None):
    """Mean-squared displacement vs frame lag 0..F-1 (simple FFT-free
    direct average; suitable for the trajectory lengths the run loop
    saves)."""
    F = _frames(traj)
    if sel is not None:
        F = F[:, jnp.asarray(sel)]
    nf = F.shape[0]

    def one_lag(lag):
        d = F[lag:] - F[: nf - lag]
        return jnp.mean(jnp.sum(d * d, axis=-1))

    lags = list(range(nf))
    return np.asarray([float(one_lag(k)) for k in lags])


# ----------------------------------------------------------------------
# CLI: `torchmd-tpu analyze <log_dir> ...` / `python -m torchmd_tpu.analysis`
# ----------------------------------------------------------------------

def interaction_energies(forces, pos, box=None, sel_a=None, sel_b=None):
    """Nonbonded interaction energy between two atom groups (GROMACS
    "energygrps"-style decomposition; e.g. protein-ligand interaction).

    Evaluates the same masked dense nonbonded math as the force field but
    keeps only pairs with one atom in `sel_a` and the other in `sel_b`
    (exclusions still apply). Returns a dict term -> energy (kcal/mol).
    sel_a/sel_b: integer index arrays; sel_b defaults to the complement
    of sel_a.
    """
    from .potentials import nonbonded_energies

    ffp = forces.ffparams
    if ffp.nb_mask is None and getattr(forces, "_nb_mask_deferred", False):
        ffp = forces.require_nb_mask()  # large-N deferral: materialize
    if ffp.nb_mask is None:
        raise ValueError("forces has no nonbonded terms")
    if sel_a is None:
        raise ValueError("sel_a (the first atom group) is required")
    n = int(ffp.charges.shape[0])
    in_a = np.zeros(n, bool)
    in_a[np.asarray(sel_a, dtype=np.int64)] = True
    if sel_b is None:
        in_b = ~in_a
    else:
        in_b = np.zeros(n, bool)
        in_b[np.asarray(sel_b, dtype=np.int64)] = True
    cross = (in_a[:, None] & in_b[None, :]) | (in_b[:, None] & in_a[None, :])
    mask = jnp.logical_and(ffp.nb_mask, jnp.asarray(cross))
    dtype = forces.dtype
    pos = jnp.asarray(np.asarray(pos), dtype=dtype)
    if pos.ndim == 3:
        pos = pos[:, :, 0]
    box_j = (jnp.zeros(3, dtype) if box is None
             else jnp.asarray(np.asarray(box).reshape(-1)[:3], dtype))
    vsg = getattr(forces, "vsites", None)
    if vsg:
        from .vsites import apply_vsites

        pos = apply_vsites(vsg, pos, box_j)
    out = nonbonded_energies(ffp._replace(nb_mask=mask), pos, box_j,
                             forces.config)
    return {k: float(v) for k, v in out.items()}


def normal_modes(forces, pos, box=None):
    """Harmonic normal-mode analysis at a (minimized) geometry.

    Differentiable-MD capability the reference lacks: the mass-weighted
    Hessian comes from one `jax.hessian` of the total potential (every
    term, including Pallas-free fused math, PME, external terms with an
    `energy_fn`), so frequencies are exact second derivatives of the same
    energy the dynamics integrates -- no finite differencing.

    forces: a `Forces` object (use precision="double" on CPU for clean
    eigenvalues); pos: (natoms, 3); box: (3,) diagonal or None.
    Returns (wavenumbers_cm1, modes): wavenumbers sorted ascending
    ((3N,), negative values are imaginary modes reported as -|nu|), and
    the mass-weighted eigenvectors as (3N, natoms, 3) displacement
    fields.
    """
    import jax

    from .potentials import compute_potentials

    dtype = forces.dtype
    pos = jnp.asarray(np.asarray(pos), dtype=dtype)
    if box is None:
        box_j = jnp.zeros(3, dtype=dtype)
    else:
        box_j = jnp.asarray(np.asarray(box).reshape(-1)[:3], dtype=dtype)

    ffp = forces.ffparams
    cfg = forces.config
    ext_fn = getattr(getattr(forces, "external", None), "energy_fn", None)
    vsg = getattr(forces, "vsites", None)

    def etot(p):
        if vsg:
            from .vsites import apply_vsites

            p = apply_vsites(vsg, p, box_j)
        pot = compute_potentials(ffp, p, box_j, cfg)
        e = sum(jax.tree_util.tree_leaves(pot))
        if getattr(forces, "_ewald", None) is not None:
            e = e + forces._ewald.energy(p, box_j)
        if ext_fn is not None:
            e = e + ext_fn(p, box_j)
        return e

    n = pos.shape[0]
    H = jax.hessian(etot)(pos).reshape(3 * n, 3 * n)
    masses = np.asarray(forces.par.masses, dtype=np.float64).reshape(-1)
    # massless rows (virtual sites) carry no dynamics: project them out
    # by giving them effectively infinite mass (zero inverse weight)
    inv_sqrt_m = np.where(masses > 0, 1.0 / np.sqrt(np.maximum(masses, 1e-30)), 0.0)
    w = np.repeat(inv_sqrt_m, 3)
    Hw = np.asarray(H, dtype=np.float64) * w[:, None] * w[None, :]
    Hw = 0.5 * (Hw + Hw.T)
    evals, evecs = np.linalg.eigh(Hw)
    # eigenvalues in kcal/mol/A^2/amu -> wavenumbers:
    # omega = sqrt(lambda * 4184 J/mol / (1e-3 kg/mol * 1e-20 m^2)) [1/s]
    # nu~ = omega / (2 pi c)
    factor = np.sqrt(4184.0 / 1e-23) / (2.0 * np.pi * 2.99792458e10)
    nu = np.sign(evals) * factor * np.sqrt(np.abs(evals))
    modes = (evecs.T * w[None, :]).reshape(3 * n, n, 3)
    return nu, modes


def main(argv=None):
    """Post-process a run directory: monitor plots (pandas/matplotlib,
    like the reference's scripts/analysis.py) and/or structural
    observables (--rmsd/--rdf/--msd) over saved trajectories."""
    import argparse
    import glob
    import os

    ap = argparse.ArgumentParser(prog="torchmd-tpu analyze")
    ap.add_argument("log_dir")
    ap.add_argument("--out", default=None,
                    help="Write a monitor PNG instead of showing")
    ap.add_argument("--traj", default=None,
                    help="Trajectory .npy inside log_dir for structural "
                         "analysis")
    ap.add_argument("--rmsd", default=None, help="Write per-frame RMSD CSV")
    ap.add_argument("--rdf", default=None, help="Write g(r) CSV (needs --box)")
    ap.add_argument("--msd", default=None, help="Write MSD-vs-lag CSV")
    ap.add_argument("--box", type=float, nargs="+", default=None,
                    help="Box diagonal (1 or 3 values) for the RDF")
    ap.add_argument("--rdf-bins", type=int, default=100)
    ap.add_argument("--view", default=None,
                    help="Render the last trajectory frame to this PNG "
                         "(the reference views frames in moleculekit; "
                         "see torchmd_tpu.viz)")
    ap.add_argument("--device", default="cpu",
                    help="Device for the structural analysis (default "
                         "cpu: post-processing must not depend on a live "
                         "accelerator tunnel)")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        # the site hook may pre-select the TPU platform; the env var
        # alone is too late (see CLAUDE.md), force it via the config
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    if args.traj is not None:
        path = os.path.join(args.log_dir, args.traj)
        if not os.path.exists(path) and os.path.exists(args.traj):
            path = args.traj
        ext = os.path.splitext(path)[-1].lower()
        if ext == ".npy":
            traj = np.load(path)
        elif ext == ".xtc":
            from .io.xtc import read_xtc

            traj = read_xtc(path)["coords"]
        elif ext == ".dcd":
            from .io.dcd import read_dcd

            traj = read_dcd(path)["coords"]
        elif ext == ".trr":
            from .io.trr import read_trr

            traj = read_trr(path)["coords"]
        else:
            raise SystemExit(f"unsupported trajectory format: {path}")
        if args.view:
            from .viz import view_frame

            frames = np.asarray(_frames(traj))
            view_frame(None, frames[-1], out=args.view,
                       title=f"{args.traj} frame {len(frames) - 1}")
            print("wrote", args.view)
        if args.rmsd:
            vals = rmsd(traj)
            np.savetxt(args.rmsd,
                       np.column_stack([np.arange(len(vals)), vals]),
                       delimiter=",", header="frame,rmsd", comments="")
            print("wrote", args.rmsd)
        if args.rdf:
            if args.box is None:
                raise SystemExit("--rdf needs --box")
            b = args.box * 3 if len(args.box) == 1 else args.box
            r, g = rdf(traj, b, nbins=args.rdf_bins)
            np.savetxt(args.rdf, np.column_stack([r, g]), delimiter=",",
                       header="r,g", comments="")
            print("wrote", args.rdf)
        if args.msd:
            vals = msd(traj)
            np.savetxt(args.msd,
                       np.column_stack([np.arange(len(vals)), vals]),
                       delimiter=",", header="lag,msd", comments="")
            print("wrote", args.msd)
        if not (args.rmsd or args.rdf or args.msd or args.view):
            raise SystemExit("--traj given but no analysis selected")
        return

    import pandas as pd
    import matplotlib

    files = sorted(glob.glob(os.path.join(args.log_dir, "monitor_*.csv")))
    if not files:
        raise SystemExit(f"No monitor_*.csv files in {args.log_dir}")
    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(8, 7), sharex=True)
    for f in files:
        df = pd.read_csv(f, comment="#")
        label = os.path.basename(f).replace("monitor_", "r").replace(
            ".csv", "")
        axes[0].plot(df["ns"], df["epot"], label=f"{label} epot", alpha=0.8)
        axes[0].plot(df["ns"], df["ekin"], label=f"{label} ekin", alpha=0.8)
        axes[0].plot(df["ns"], df["etot"], label=f"{label} etot", alpha=0.8)
        axes[1].plot(df["ns"], df["T"], label=label, alpha=0.8)
    axes[0].set_ylabel("energy (kcal/mol)")
    axes[0].legend(fontsize=7)
    axes[1].set_ylabel("T (K)")
    axes[1].set_xlabel("time (ns)")
    axes[1].legend(fontsize=7)
    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=120)
        print("wrote", args.out)
    else:
        plt.show()


if __name__ == "__main__":
    main()
