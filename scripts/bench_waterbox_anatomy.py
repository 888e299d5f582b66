"""Stage anatomy of the 62.5k-atom TIP4P waterbox step (docs/PERF.md).

Slope-times each stage of the production water-box configuration
(column kernel + PME + vsites + SETTLE, the bench_waterbox.py system)
inside its own jitted lax.scan, cancelling the axon-tunnel dispatch
constant — same methodology as bench_pair_production.py. Prints one
JSON line per stage.

Usage: python scripts/bench_waterbox_anatomy.py [--n 25] [--stages all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np  # noqa: E402


def slope_time(make, k1=4, k2=20, rounds=3):
    import jax

    def timed(K):
        fn = make(K)
        out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = fn()
            float(np.asarray(
                jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25)
    ap.add_argument("--cutoff", type=float, default=8.5)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_waterbox import build_box

    from torchmd_tpu.forces import Forces
    from torchmd_tpu.integrator import Integrator, maxwell_boltzmann
    from torchmd_tpu.systems import System

    t0 = time.time()
    mol, par, terms, L = build_box(args.n)
    natoms = mol.numAtoms
    print(f"# built {natoms} atoms, box {L:.1f} A in {time.time()-t0:.1f}s",
          flush=True)

    forces = Forces(par, terms=terms, precision="single",
                    cutoff=args.cutoff, elec="ewald")
    box = np.full((3,), L, np.float32)
    forces.resolve_kernel_for_box(box)
    forces.ensure_ewald(box)
    forces.ensure_cell_kernel(box, pos0=mol.coords[:, :, 0])
    kern = forces._cell_kernel
    rec = forces._ewald
    pos0 = jnp.asarray(mol.coords[:, :, 0], jnp.float32)
    boxj = jnp.asarray(box)
    print(f"# kernel={type(kern).__name__} recip={type(rec).__name__} "
          f"order={getattr(rec, 'ORDER', None)} "
          f"kmesh={getattr(rec.cfg, 'kmax', None)}", flush=True)

    want = args.stages.split(",") if args.stages != "all" else None

    def report(name, fn_maker):
        # substring match so e.g. --stages pme selects every PME stage
        if want is not None and not any(
                w.strip() and w.strip() in name for w in want):
            return
        try:
            per = slope_time(fn_maker)
        except Exception as e:  # best-effort: a stage that fails to
            # compile (e.g. remote-compile payload limits on the axon
            # tunnel) must not kill the remaining stages
            print(f"# stage {name!r} skipped: {e!r}"[:300], flush=True)
            return
        print(json.dumps({"stage": name, "ms": round(per * 1e3, 3)}),
              flush=True)

    # jitter positions through the scan carry so XLA cannot hoist the
    # stage out of the loop
    def scan_over(body_fn):
        def make(K):
            @jax.jit
            def go():
                def body(carry, _):
                    p = pos0 + carry * jnp.float32(1e-37)
                    out = body_fn(p)
                    e = jax.tree_util.tree_leaves(out)[0]
                    e = jnp.sum(e) if e.ndim else e
                    return e.astype(jnp.float32), e
                _, es = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), None, length=K)
                return es[-1]
            return go
        return make

    cl0 = jax.jit(kern.build)(pos0, boxj)
    jax.block_until_ready(cl0)

    def all_sum(out):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out)
                   if jnp.issubdtype(l.dtype, jnp.floating))

    def pair_full(p):
        pot, frc = kern.energy_forces(p, boxj, cl0)
        return all_sum(pot) + jnp.sum(frc)

    report("pair eval+forces (column kernel, fixed cl)",
           scan_over(pair_full))
    report("pair eval+forces vmapped batch-1",
           scan_over(lambda p: jax.vmap(
               lambda q: pair_full(q))(p[None])[0]))
    report("neighbor rebuild (kern.build)",
           scan_over(lambda p: all_sum(kern.build(p, boxj))))
    if forces.vsites:
        from torchmd_tpu.vsites import apply_vsites

        def vs_roundtrip(p):
            p2, vjp = jax.vjp(
                lambda x: apply_vsites(forces.vsites, x, boxj), p)
            (fr,) = vjp(p2 * jnp.float32(1e-3))
            return jnp.sum(p2) + jnp.sum(fr)

        report("vsite snap + vjp spread", scan_over(vs_roundtrip))
    try:
        from torchmd_tpu.constraints import (
            apply_position_constraints, apply_velocity_constraints,
            build_constraint_spec)

        import jax.numpy as _jnp
        masses = _jnp.asarray(par.masses, jnp.float32)
        cs = build_constraint_spec(par, masses, mode="settle")
        if cs is not None:
            report("settle shake+rattle", scan_over(
                lambda p: jnp.sum(apply_position_constraints(
                    cs, p, p + jnp.float32(1e-3)))
                + jnp.sum(apply_velocity_constraints(
                    cs, p, p * jnp.float32(1e-3)))))
    except Exception as e:  # API drift guard: anatomy stays best-effort
        print(f"# settle stage skipped: {e!r}", flush=True)
    report("pme energy (fwd)", scan_over(lambda p: rec.energy(p, boxj)))

    # NB: these two must CONSUME the gradient/forces — summing only the
    # energy lets XLA dead-code-eliminate the whole force computation
    # (the round-4 "4.2 ms energy_forces" number was exactly that
    # artifact; the knockout probes measured the real composed cost)
    def pme_vg(p):
        e, g = jax.value_and_grad(rec.energy)(p, boxj)
        return e + jnp.sum(g)

    def pme_ef(p):
        e, f = rec.energy_forces(p, boxj)
        return e + jnp.sum(f)

    report("pme energy+grad (consumed)", scan_over(pme_vg))
    report("pme energy_forces (consumed)", scan_over(pme_ef))
    report("pme spread only",
           scan_over(lambda p: jnp.sum(
               rec._spread(p, boxj, rec.charges))))
    report("fftn of mesh", scan_over(
        lambda p: jnp.sum(jnp.abs(jnp.fft.fftn(
            rec._spread(jax.lax.stop_gradient(p), boxj, rec.charges))))))

    # -- PME-internal sub-ledger (each stage consumed, so nothing DCEs):
    # decomposes energy_forces = tap rows -> spread -> fft/phi -> force
    # gather -> corrections
    if hasattr(rec, "_tap_rows_d"):
        def pme_taprows(p):
            rows, drows = rec._tap_rows_d(p, boxj)
            return (sum(jnp.sum(r) for r in rows)
                    + sum(jnp.sum(d) for d in drows))

        report("pme tap rows+d", scan_over(pme_taprows))

        def pme_phi(p):
            Kx, Ky, Kz = rec.cfg.kmax
            mesh = rec._spread(p, boxj, rec.charges)
            ftype = mesh.dtype
            Sk = jnp.fft.rfftn(mesh)
            B, wh = rec._bhalf(boxj, ftype)
            s2 = Sk.real**2 + Sk.imag**2
            e = jnp.sum((B * s2) @ wh)
            phi = jnp.fft.irfftn(B.astype(Sk.dtype) * Sk,
                                 s=(Kx, Ky, Kz)).astype(ftype)
            return e + jnp.sum(phi)

        report("pme spread+fft+phi", scan_over(pme_phi))

        # force gather alone: phi held closure-constant, so only the
        # pos-dependent tap rows + gather contractions are in the loop
        Kx, Ky, Kz = rec.cfg.kmax
        phi0 = jnp.zeros((Kx, Ky, Kz), jnp.float32) + 1e-3

        def pme_gather_only(p):
            # the exact chunked gather scan of energy_forces, with phi
            # closure-constant (isolates the gather contractions)
            (Rx, Ry, Rz), (dRx, dRy, dRz) = rec._tap_rows_d(p, boxj)
            q = rec.charges.astype(p.dtype)
            Rzq, dRzq = Rz * q[:, None], dRz * q[:, None]
            phiT = phi0.reshape(Kx * Ky, Kz).T
            prec = jax.lax.Precision.HIGHEST
            N = p.shape[0]
            M = 4096
            C = -(-N // M)
            pad = C * M - N

            def padded(a):
                if pad:
                    a = jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
                return a.reshape((C, M) + a.shape[1:])

            def gather_body(_, rows):
                rx, ry, rzq, drx, dry, drzq = rows
                z2 = jnp.concatenate([rzq, drzq], axis=0)
                h2 = jnp.einsum("az,zp->ap", z2, phiT, precision=prec)
                H = h2[:M].reshape(M, Kx, Ky)
                Hd = h2[M:].reshape(M, Kx, Ky)
                ty = jnp.einsum("mxy,my->mx", H, ry)
                tx = jnp.einsum("mxy,mx->my", H, rx)
                tyd = jnp.einsum("mxy,my->mx", Hd, ry)
                fx = -jnp.sum(drx * ty, axis=1)
                fy = -jnp.sum(dry * tx, axis=1)
                fz = -jnp.sum(rx * tyd, axis=1)
                return None, jnp.stack([fx, fy, fz], axis=1)

            _, frc = jax.lax.scan(
                gather_body, None,
                (padded(Rx), padded(Ry), padded(Rzq),
                 padded(dRx), padded(dRy), padded(dRzq)))
            return jnp.sum(frc)

        report("pme force gather (chunked, const phi)",
               scan_over(pme_gather_only))

        def pme_corr(p):
            q = rec.charges.astype(p.dtype)
            e, g = jax.value_and_grad(
                lambda pp: rec._corrections(pp, boxj, q))(p)
            return e + jnp.sum(g)

        report("pme corrections e+grad", scan_over(pme_corr))
    report("bonded_ef_one",
           scan_over(lambda p: forces.bonded_ef_one(p, boxj)[1]))
    report("full ef_one (vsites+pair+pme+bonded)",
           scan_over(lambda p: forces.ef_one(p, boxj)[1]))

    # -- knockout probes: localize the gap between the sum of the stage
    # costs above (each measured with a CLOSURE-CONSTANT cl, which lets
    # XLA hoist every cl-dependent gather out of the scan) and the real
    # step, where cl is a carried value flowing through the rebuild cond
    if want is not None and "knockout" in want:
        def pair_carried_cl(with_pme):
            def make(K):
                @jax.jit
                def go():
                    def body(carry, _):
                        cl, acc = carry
                        p = pos0 + acc * jnp.float32(1e-37)
                        # same cond as the production scan: cl is NOT
                        # loop-invariant, so nothing cl-dependent hoists
                        cl = jax.lax.cond(
                            kern.needs_rebuild(cl, p, boxj),
                            lambda: kern.build(p, boxj),
                            lambda: cl)
                        pot, frc = kern.energy_forces(p, boxj, cl)
                        e = all_sum(pot) + jnp.sum(frc)
                        if with_pme:
                            er, erf = rec.energy_forces(p, boxj)
                            e = e + er + jnp.sum(erf)
                        return (cl, e.astype(jnp.float32)), e
                    (_, _), es = jax.lax.scan(
                        body, (cl0, jnp.zeros((), jnp.float32)),
                        None, length=K)
                    return es[-1]
                return go
            return make

        def report_now(name, fn_maker):
            try:
                per = slope_time(fn_maker)
            except Exception as e:
                print(f"# stage {name!r} skipped: {e!r}"[:300], flush=True)
                return
            print(json.dumps({"stage": name, "ms": round(per * 1e3, 3)}),
                  flush=True)

        report_now("pair+cond (carried cl)", pair_carried_cl(False))
        report_now("pair+cond+pme (carried cl)", pair_carried_cl(True))
        # full force stage in composition (kernel-backed ef_one):
        # isolates whether pair/pme/vsites/bonded fuse worse together
        report_now("full ef_one (kernel-backed)",
                   scan_over(lambda p: forces.ef_one(p, boxj)[1]))

        from torchmd_tpu.constraints import (
            apply_position_constraints as _apc,
            apply_velocity_constraints as _avc,
            build_constraint_spec as _bcs)
        from torchmd_tpu.vsites import apply_vsites as _avs
        _masses = jnp.asarray(par.masses, jnp.float32)
        _cs = _bcs(par, _masses, mode="settle")

        def settle_vs_body(p):
            # the scan composition: shake + vsite snap + rattle, exactly
            # as the production body orders them (without forces)
            pc = _apc(_cs, p + jnp.float32(1e-5), p)
            pc = _avs(forces.vsites, pc, boxj)
            v = _avc(_cs, pc, pc * jnp.float32(1e-3))
            return jnp.sum(pc) + jnp.sum(v)

        if _cs is not None and forces.vsites:
            report_now("settle+vsnap+rattle (composed)",
                       scan_over(settle_vs_body))

        from torchmd_tpu.integrator import Integrator as _Int

        def step_variant(name, thermostat=None, constraints=None,
                         static_cl=False):
            try:
                fr = Forces(par, terms=terms, precision="single",
                            cutoff=args.cutoff, elec="ewald")
                syst = System(natoms, 1, "single")
                syst.set_positions(mol.coords)
                syst.set_box(mol.box)
                syst.set_velocities(
                    maxwell_boltzmann(par.masses, 300.0, 1, seed=3))
                kw = dict(constraints=constraints, seed=3)
                if thermostat:
                    kw.update(thermostat=thermostat, T=300.0)
                integ = _Int(syst, fr, timestep=2.0, **kw)
                if static_cl:
                    k2 = integ._cell_kernel
                    k2.needs_rebuild = (
                        lambda st, pos, box=None: jnp.zeros((), bool))

                def timed(K):
                    integ.step(niter=K)
                    best = float("inf")
                    for _ in range(2):
                        t0 = time.perf_counter()
                        integ.step(niter=K)
                        best = min(best, time.perf_counter() - t0)
                    return best

                per = (timed(100) - timed(20)) / 80
                print(json.dumps({"stage": name, "ms": round(per * 1e3, 3)}),
                      flush=True)
            except Exception as e:
                print(f"# variant {name!r} skipped: {e!r}"[:300], flush=True)

        step_variant("step nhc+settle (baseline)",
                     thermostat="nhc", constraints="settle")
        step_variant("step nhc no-settle", thermostat="nhc")
        step_variant("step bare-VV (no thermo/settle)")
        step_variant("step nhc+settle static-cl",
                     thermostat="nhc", constraints="settle", static_cl=True)

    # full MD step: slope over niter through Integrator.step
    if want is None or "step" in want:
        syst = System(natoms, 1, "single")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=3))
        integ = Integrator(syst, forces, timestep=2.0, thermostat="nhc",
                           T=300.0, constraints="settle", seed=3)

        def timed(K):
            integ.step(niter=K)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                integ.step(niter=K)
                best = min(best, time.perf_counter() - t0)
            return best

        per = (timed(100) - timed(20)) / 80
        print(json.dumps({"stage": "full NVT step (in scan)",
                          "ms": round(per * 1e3, 3)}), flush=True)

    # rebuild cadence at equilibrated 300 K: emulate the in-scan top-2
    # displacement trigger on the host over single-step chunks (the scan
    # state is opaque; the emulation applies the identical criterion to
    # the gathered positions, so the counted cadence matches what the
    # lax.cond sees up to a one-step phase shift)
    if want is None or "cadence" in want:
        syst = System(natoms, 1, "single")
        syst.set_positions(mol.coords)
        syst.set_box(mol.box)
        syst.set_velocities(maxwell_boltzmann(par.masses, 300.0, 1, seed=3))
        integ = Integrator(syst, forces, timestep=2.0, thermostat="nhc",
                           T=300.0, constraints="settle", seed=3)
        for _ in range(4):
            integ.step(niter=250)   # equilibrate the lattice melt
        skin = float(integ._cell_kernel.ccfg.skin)
        bb = np.full(3, L)
        ref = np.asarray(syst.pos)[0].copy()
        fires, nprobe = 0, 300
        for _ in range(nprobe):
            integ.step(niter=1)
            p = np.asarray(syst.pos)[0]
            d = p - ref
            d -= bb * np.round(d / bb)
            d2 = np.sum(d * d, axis=1)
            top2 = np.sort(d2)[-2:]
            if np.sqrt(top2[1]) + np.sqrt(top2[0]) > skin:
                fires += 1
                ref = p.copy()
        print(json.dumps({"stage": "rebuild cadence (equil 300K)",
                          "fires": fires, "probe_steps": nprobe,
                          "cadence_steps": round(nprobe / max(fires, 1), 1),
                          "skin": skin}), flush=True)


if __name__ == "__main__":
    main()
