"""Generate tests/goldens/oracle_goldens.json from the independent
numpy oracle engine (tests/oracle_engine.py): per-term energies for all
bundled data folders plus central-difference forces for a seeded sample
of atoms. Run from the repo root; deterministic, checked in as data
(the role OpenMM goldens play in the reference's harness)."""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from glob import glob

import numpy as np

from common import ALL_TERMS, load_system
from torchmd_tpu.parameters import Parameters
import oracle_engine as oe

N_FORCE_ATOMS = 6


def main():
    out = {}
    data = os.path.join(REPO, "tests", "data")
    for folder in sorted(glob(os.path.join(data, "*", ""))):
        name = os.path.basename(os.path.abspath(folder))
        mol, ff, nbconf = load_system(folder)
        par = Parameters(ff, mol, ALL_TERMS, precision="double")
        pos = mol.coords[:, :, 0]
        box = mol.box[:, 0] if not np.all(mol.box == 0) else None
        terms = oe.total_per_term(par, pos, box, **nbconf)
        rs = np.random.RandomState(1234)
        atoms = sorted(
            rs.choice(mol.numAtoms, size=min(N_FORCE_ATOMS, mol.numAtoms),
                      replace=False).tolist()
        )
        frc = oe.fd_forces(par, pos, box, atoms, **nbconf)
        out[name] = {
            "nbconf": {k: (None if v is None else float(v))
                       if not isinstance(v, bool) else v
                       for k, v in nbconf.items()},
            "natoms": int(mol.numAtoms),
            "terms": {k: float(v) for k, v in terms.items()},
            "fd_forces": frc,
        }
        print(f"{name}: total={terms['total']:.6f}", flush=True)
    dst = os.path.join(REPO, "tests", "goldens")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "oracle_goldens.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", os.path.join(dst, "oracle_goldens.json"))


def main_v2():
    """v2 families (round 4): Ewald direct-sum, GB/OBC loops, vsite FD
    spreading — written to oracle_goldens_v2.json."""
    import tempfile

    from common import (
        oracle_v2_ewald_case,
        oracle_v2_gb_case,
        oracle_v2_vsite_arrays,
        oracle_v2_vsite_case,
    )

    data = os.path.join(REPO, "tests", "data")
    out = {}

    for name in ("sodiumperiodic", "2watersperiodic",
                 "prod_alanine_dipeptide_amber"):
        mol, par, pos, box, alpha, kmax, pairs, cutoff = (
            oracle_v2_ewald_case(name, data)
        )
        e = oe.ewald_electrostatics(
            np.asarray(par.charges, np.float64), pos, box, alpha, kmax,
            excl_pairs=pairs,
        )
        out["ewald_" + name] = {
            "natoms": int(mol.numAtoms),
            "cutoff": cutoff,
            "alpha": alpha,
            "kmax": list(kmax),
            "electrostatics": float(e),
        }
        print(f"ewald_{name}: {e:.8f}", flush=True)

    gb, pos = oracle_v2_gb_case(data)
    q = np.asarray(gb.charges, np.float64)
    radii = np.asarray(gb.radii, np.float64)
    screen = np.asarray(gb.screen, np.float64)
    e = oe.gb_obc_energy(q, radii, screen, pos, sa=True)
    rs = np.random.RandomState(77)
    atoms = sorted(rs.choice(len(q), size=5, replace=False).tolist())
    frc = oe.gb_fd_forces(q, radii, screen, pos, atoms, sa=True)
    out["gb_ligand-amber"] = {
        "natoms": int(len(q)),
        "energy": float(e),
        "fd_forces": frc,
    }
    print(f"gb_ligand-amber: {e:.8f}", flush=True)

    with tempfile.TemporaryDirectory() as td:
        par, forces, pos, box = oracle_v2_vsite_case(td)
        q, sig, eps, keep, sites, hosts, vparams = (
            oracle_v2_vsite_arrays(par, forces)
        )
        pos_snap = oe.tip4p_reconstruct(pos, sites, hosts, vparams)
        e = oe.vsite_nonbonded_energy(
            q, sig, eps, pos_snap, box, keep, 3.0, switch_dist=2.5,
            rfa=True,
        )
        rs = np.random.RandomState(55)
        host_atoms = sorted(
            rs.choice([a for a in range(len(q)) if a not in sites],
                      size=5, replace=False).tolist()
        )
        frc = oe.vsite_fd_forces(
            q, sig, eps, pos, box, keep, 3.0, sites, hosts, vparams,
            host_atoms, switch_dist=2.5, rfa=True,
        )
        out["vsites_tip4p"] = {
            "natoms": int(len(q)),
            "energy": float(e),
            "fd_forces": frc,
        }
        print(f"vsites_tip4p: {e:.8f}", flush=True)

    dst = os.path.join(REPO, "tests", "goldens")
    with open(os.path.join(dst, "oracle_goldens_v2.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", os.path.join(dst, "oracle_goldens_v2.json"))




def main_v3():
    """v3 families (round 5): the polarizable stack -- permanent
    multipoles (hand-derived T-tensor contractions, cross-checked at
    generation time against a point-charge discretization with
    Richardson extrapolation), Thole induced-dipole SCF (dense direct
    solve), a Drude case (first-principles extended topology +
    FD-Newton SCF), and CMAP (scipy tensor-product periodic splines).
    Written to oracle_goldens_v3.json."""
    from common import (
        oracle_v3_amoeba_case,
        oracle_v3_cmap_case,
        oracle_v3_drude_case,
    )

    out = {}

    # -- permanent multipoles (AMOEBA water dimer) ---------------------
    elec, pos, raw = oracle_v3_amoeba_case()
    mp_args = (raw["charges"], pos, raw["sites"], raw["mu_local"],
               raw["frame_kind"], raw["z_atom"], raw["x_atom"],
               raw["nb_mask"])
    terms = oe.multipole_energy(*mp_args, quad_local=raw["quad_local"])
    # derivation-independent cross-check: point-charge discretization,
    # Richardson-extrapolated over d and d/2
    e_d = oe.multipole_point_charge_energy(
        *mp_args, quad_local=raw["quad_local"], d=2e-2)
    e_d2 = oe.multipole_point_charge_energy(
        *mp_args, quad_local=raw["quad_local"], d=1e-2)
    rich = (4.0 * e_d2 - e_d) / 3.0
    scale = max(1.0, abs(terms["total"]))
    assert abs(rich - terms["total"]) < 2e-6 * scale, (
        rich, terms["total"])
    fd = oe.multipole_fd_forces(
        *mp_args, atoms=list(range(6)), quad_local=raw["quad_local"])
    out["multipoles_water_dimer"] = {
        "natoms": int(len(raw["charges"])),
        "terms": {k: float(v) for k, v in terms.items()},
        "point_charge_extrapolated": float(rich),
        "fd_forces": fd,
    }
    print(f"multipoles_water_dimer: total={terms['total']:.8f} "
          f"(pc xcheck {rich:.8f})", flush=True)

    # -- Thole induced-dipole SCF --------------------------------------
    pol_args = (raw["charges"], pos, raw["sites"], raw["mu_local"],
                raw["frame_kind"], raw["z_atom"], raw["x_atom"],
                raw["quad_local"], raw["pol_sites"], raw["alpha"],
                raw["thole"], raw["perm_mask"])
    e_pol, mu_ind, E_perm = oe.thole_polarization_solve(*pol_args)
    fd_pol = oe.polarization_fd_forces(*pol_args, atoms=[0, 1, 3, 5])
    out["polarization_water_dimer"] = {
        "energy": float(e_pol),
        "mu_induced": mu_ind.tolist(),
        "fd_forces": fd_pol,
    }
    print(f"polarization_water_dimer: {e_pol:.8f}", flush=True)

    # -- Drude ---------------------------------------------------------
    ffp_ext, spec, cfg, pos3, p_fixed, draw = oracle_v3_drude_case()
    parts = oe.drude_extended_energy(
        draw["charges"], draw["alpha"], draw["nb_mask"], p_fixed,
        draw["k_drude"], draw["thole"])
    p_rel, e_scf, mu_d = oe.drude_scf(
        draw["charges"], draw["alpha"], draw["nb_mask"], pos3,
        draw["k_drude"], draw["thole"])
    out["drude_3atom"] = {
        "fixed_terms": {k: float(v) for k, v in parts.items()},
        "scf_energy": float(e_scf),
        "mu_induced": mu_d.tolist(),
    }
    print(f"drude_3atom: fixed={parts['total']:.8f} scf={e_scf:.8f}",
          flush=True)

    # -- CMAP ------------------------------------------------------------
    grids, cidx, ctypes, pos8 = oracle_v3_cmap_case()
    e_cmap = oe.cmap_energy_scipy(grids, cidx, ctypes, pos8)
    fd_cmap = oe.cmap_fd_forces(grids, cidx, ctypes, pos8,
                                atoms=[0, 2, 4, 7])
    out["cmap_chain"] = {
        "energy": float(e_cmap),
        "fd_forces": fd_cmap,
    }
    print(f"cmap_chain: {e_cmap:.8f}", flush=True)

    dst = os.path.join(REPO, "tests", "goldens")
    with open(os.path.join(dst, "oracle_goldens_v3.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", os.path.join(dst, "oracle_goldens_v3.json"))


if __name__ == "__main__":
    only = [a for a in sys.argv[1:] if a.startswith("--")]
    if "--v3-only" in only:
        main_v3()
    elif "--v2-only" in only:
        main_v2()
    else:
        main()
        main_v2()
        main_v3()
