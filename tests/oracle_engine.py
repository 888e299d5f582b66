"""Independent second-engine oracle: plain-numpy force-field evaluation.

The reference validates against OpenMM as a second engine
(/root/reference/tests/test_torchmd.py:31-193). OpenMM is not
installable in this container, so this module plays that role: a
from-scratch numpy implementation of the CHARMM/AMBER functional forms,
written against the physics definitions with deliberately different
formulations from torchmd_tpu.potentials --

  - angles via atan2(|u x v|, u.v) instead of clamped acos,
  - torsions via plane normals and atan2((n1 x n2).b2hat, n1.n2),
  - LJ via 4 eps ((sigma/r)^12 - (sigma/r)^6) power evaluation instead
    of precombined A/B coefficients,
  - chunked explicit pair loops instead of a masked dense matrix,
  - forces via central finite differences of the total energy (sampled
    atoms) instead of any analytic/AD path.

Per-term energies (and sampled FD forces) for the bundled data folders
are generated once by scripts/gen_oracle_goldens.py and checked in as
tests/goldens/oracle_goldens.json; tests/test_oracle.py asserts the JAX
engine against them.

Independence scope (documented honestly): topology/parameter READING is
cross-checked against upstream TorchMD's moleculekit/parmed readers in
test_parity_reference.py; this oracle independently checks the
EVALUATION math on the assembled parameter tensors. Together the two
oracles break the single-source "bug-compatible with upstream" failure
mode for every stage except the shared parameter-assembly layout.
"""

from __future__ import annotations

import numpy as np
from scipy import constants as sc

# Coulomb constant in kcal/mol * Angstrom / e^2, derived from CODATA the
# same way the reference does (torchmd/forces.py:375-378) -- this is
# physics, not implementation.
ELEC_FACTOR = (
    1.0 / (4.0 * np.pi * sc.epsilon_0)   # J m / C^2
    * sc.elementary_charge ** 2          # -> J m
    / sc.angstrom                        # -> J per Angstrom pair
    * sc.Avogadro                        # -> J/mol
    / (sc.calorie * 1000.0)              # -> kcal/mol
)


def _minimum_image(dv, box):
    if box is None:
        return dv
    box = np.asarray(box, np.float64).reshape(3)
    out = dv.copy()
    for a in range(3):
        if box[a] > 0:
            out[..., a] -= box[a] * np.round(out[..., a] / box[a])
    return out


def _expand(table):
    """{idx, map, params} -> (idx_rows, param_rows) with the map applied
    (multi-term dihedrals give several rows per quad)."""
    idx = np.asarray(table["idx"])
    mp = np.asarray(table["map"])
    params = np.asarray(table["params"], np.float64)
    return idx[mp[:, 0]], params[mp[:, 1]]


def bonds_energy(par, pos, box, cutoff=None):
    if par.bond_params is None or not len(par.bond_params["idx"]):
        return 0.0
    idx, prm = _expand(par.bond_params)
    dv = _minimum_image(pos[idx[:, 1]] - pos[idx[:, 0]], box)
    r = np.sqrt((dv * dv).sum(1))
    k0, r0 = prm[:, 0], prm[:, 1]
    e = k0 * (r - r0) ** 2
    if cutoff is not None:
        # reference quirk kept for parity: bonded terms are cutoff-
        # filtered when a cutoff is set (torchmd/forces.py:128-136)
        e = np.where(r <= cutoff, e, 0.0)
    return float(np.sum(e))


def urey_bradley_energy(par, pos, box):
    tab = getattr(par, "urey_bradley_params", None)
    if tab is None or not len(tab["idx"]):
        return 0.0
    idx, prm = _expand(tab)
    dv = _minimum_image(pos[idx[:, 1]] - pos[idx[:, 0]], box)
    r = np.sqrt((dv * dv).sum(1))
    return float(np.sum(prm[:, 0] * (r - prm[:, 1]) ** 2))


def angles_energy(par, pos, box):
    if par.angle_params is None or not len(par.angle_params["idx"]):
        return 0.0
    idx, prm = _expand(par.angle_params)
    u = _minimum_image(pos[idx[:, 0]] - pos[idx[:, 1]], box)
    v = _minimum_image(pos[idx[:, 2]] - pos[idx[:, 1]], box)
    cross = np.cross(u, v)
    theta = np.arctan2(np.sqrt((cross * cross).sum(1)), (u * v).sum(1))
    k0, t0 = prm[:, 0], prm[:, 1]
    return float(np.sum(k0 * (theta - t0) ** 2))


def _torsion_phi(pos, idx, box):
    b1 = _minimum_image(pos[idx[:, 1]] - pos[idx[:, 0]], box)
    b2 = _minimum_image(pos[idx[:, 2]] - pos[idx[:, 1]], box)
    b3 = _minimum_image(pos[idx[:, 3]] - pos[idx[:, 2]], box)
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    b2n = b2 / np.sqrt((b2 * b2).sum(1, keepdims=True))
    x = (n1 * n2).sum(1)
    y = (np.cross(n1, n2) * b2n).sum(1)
    return np.arctan2(y, x)


def _torsion_energy(table, pos, box):
    idx, prm = _expand(table)
    phi = _torsion_phi(pos, idx, box)
    k0, phi0, per = prm[:, 0], prm[:, 1], prm[:, 2]
    amber = per > 0
    e = np.where(
        amber,
        k0 * (1.0 + np.cos(per * phi - phi0)),
        0.0,
    )
    # CHARMM harmonic branch with the +-pi wrap
    diff = phi - phi0
    diff = diff - 2.0 * np.pi * np.round(diff / (2.0 * np.pi))
    e = np.where(amber, e, k0 * diff * diff)
    return float(np.sum(e))


def dihedrals_energy(par, pos, box):
    if par.dihedral_params is None or not len(par.dihedral_params["idx"]):
        return 0.0
    return _torsion_energy(par.dihedral_params, pos, box)


def impropers_energy(par, pos, box):
    if par.improper_params is None or not len(par.improper_params["idx"]):
        return 0.0
    return _torsion_energy(par.improper_params, pos, box)


def nb14_energies(par, pos, box):
    tab = par.nonbonded_14_params
    if tab is None or not len(tab["idx"]):
        return 0.0, 0.0
    idx, prm = _expand(tab)
    dv = _minimum_image(pos[idx[:, 1]] - pos[idx[:, 0]], box)
    r = np.sqrt((dv * dv).sum(1))
    A, B, scnb, scee = prm[:, 0], prm[:, 1], prm[:, 2], prm[:, 3]
    e_lj = float(np.sum((A / r ** 12 - B / r ** 6) / scnb))
    q = np.asarray(par.charges, np.float64)
    e_el = float(np.sum(
        ELEC_FACTOR * q[idx[:, 0]] * q[idx[:, 1]] / (r * scee)
    ))
    return e_lj, e_el


def _pair_list(par, natoms):
    """Explicit (i < j) nonbonded pair list honoring the exclusions."""
    excl = par.get_exclusions(types=("bonds", "angles", "1-4"),
                              fullarray=True)
    keep = ~np.asarray(excl, bool)
    np.fill_diagonal(keep, False)
    iu, ju = np.triu_indices(natoms, k=1)
    sel = keep[iu, ju]
    return iu[sel], ju[sel]


def nonbonded_energies(par, pos, box, cutoff=None, switch_dist=None,
                       rfa=False, solvent_dielectric=78.5,
                       chunk=500_000):
    """(lj, electrostatics) over explicit pair loops."""
    natoms = pos.shape[0]
    ii, jj = _pair_list(par, natoms)
    sig_t = np.asarray(par.nonbonded_params["params"], np.float64)[:, 0]
    eps_t = np.abs(
        np.asarray(par.nonbonded_params["params"], np.float64)[:, 1]
    )
    t = np.asarray(par.mapped_atom_types)
    q = np.asarray(par.charges, np.float64)

    krf = crf = 0.0
    if rfa and cutoff:
        eps_rf = solvent_dielectric
        krf = (1.0 / cutoff ** 3) * (eps_rf - 1.0) / (2.0 * eps_rf + 1.0)
        crf = (1.0 / cutoff) * (3.0 * eps_rf) / (2.0 * eps_rf + 1.0)

    e_lj = 0.0
    e_el = 0.0
    for s in range(0, len(ii), chunk):
        i = ii[s:s + chunk]
        j = jj[s:s + chunk]
        dv = _minimum_image(pos[j] - pos[i], box)
        r = np.sqrt((dv * dv).sum(1))
        if cutoff is not None:
            inside = r <= cutoff
            if not inside.any():
                continue
            i, j, r = i[inside], j[inside], r[inside]
        sig = 0.5 * (sig_t[t[i]] + sig_t[t[j]])
        eps = np.sqrt(eps_t[t[i]] * eps_t[t[j]])
        sr6 = (sig / r) ** 6
        elj = 4.0 * eps * (sr6 * sr6 - sr6)
        if switch_dist is not None and cutoff is not None:
            x = (r - switch_dist) / (cutoff - switch_dist)
            x = np.clip(x, 0.0, 1.0)
            sw = 1.0 + x * x * x * (-10.0 + x * (15.0 - 6.0 * x))
            elj = np.where(r > switch_dist, elj * sw, elj)
        e_lj += float(np.sum(elj))
        qq = ELEC_FACTOR * q[i] * q[j]
        if rfa and cutoff:
            e_el += float(np.sum(qq * (1.0 / r + krf * r * r - crf)))
        else:
            e_el += float(np.sum(qq / r))
    return e_lj, e_el


def total_per_term(par, pos, box, cutoff=None, switch_dist=None,
                   rfa=False):
    pos = np.asarray(pos, np.float64)
    e_lj14, e_el14 = nb14_energies(par, pos, box)
    e_lj, e_el = nonbonded_energies(
        par, pos, box, cutoff=cutoff, switch_dist=switch_dist, rfa=rfa
    )
    out = {
        # NOTE: urey_bradley_energy exists for UB-enabled configs but the
        # parity term set (ALL_TERMS) does not include it, matching the
        # reference's term registry
        "bonds": bonds_energy(par, pos, box, cutoff=cutoff),
        "angles": angles_energy(par, pos, box),
        "dihedrals": dihedrals_energy(par, pos, box),
        "impropers": impropers_energy(par, pos, box),
        "lj": e_lj + e_lj14,
        "electrostatics": e_el + e_el14,
    }
    out["total"] = sum(out.values())
    return out


def fd_forces(par, pos, box, atoms, h=1e-5, **nbconf):
    """Central-difference forces for a subset of atoms: -(dE/dx)."""
    pos = np.asarray(pos, np.float64)
    out = {}
    for a in atoms:
        f = np.zeros(3)
        for d in range(3):
            pp = pos.copy()
            pp[a, d] += h
            ep = total_per_term(par, pp, box, **nbconf)["total"]
            pm = pos.copy()
            pm[a, d] -= h
            em = total_per_term(par, pm, box, **nbconf)["total"]
            f[d] = -(ep - em) / (2.0 * h)
        out[int(a)] = f.tolist()
    return out


# ----------------------------------------------------------------------
# v2 families: Ewald, GB/OBC, virtual sites (round-4 oracle extension)
# ----------------------------------------------------------------------

def ewald_electrostatics(q, pos, box, alpha, kmax, excl_pairs=()):
    """Classic Ewald total electrostatics with deliberately different
    formulations from torchmd_tpu.ewald:

      - real space: explicit pair loop over ALL periodic image shells
        n in {-1,0,1}^3 with erfc damping (no minimum-image cutoff mask
        -- the erfc tail makes truncation differences < the chosen tol),
      - reciprocal: direct triple loop over k-vectors with scalar
        cos/sin accumulators (no separable phase tables, no complex
        matmuls),
      - self and net-charge terms analytic,
      - excluded pairs subtract qq erf(alpha r)/r at minimum image.

    Returns the total in kcal/mol. Physics definition: Essmann et al.
    1995 eqs. 2.1-2.5 (same equations the engine implements)."""
    from scipy.special import erf, erfc

    q = np.asarray(q, np.float64)
    pos = np.asarray(pos, np.float64)
    box = np.asarray(box, np.float64).reshape(3)
    n = len(q)
    V = float(np.prod(box))

    # real space over image shells
    e_real = 0.0
    iu, ju = np.triu_indices(n, k=1)
    excl_set = {tuple(sorted(p)) for p in excl_pairs}
    keep = np.array([
        (int(i), int(j)) not in excl_set for i, j in zip(iu, ju)
    ])
    d0 = pos[iu] - pos[ju]
    for nx in (-1, 0, 1):
        for ny in (-1, 0, 1):
            for nz in (-1, 0, 1):
                shift = np.array([nx, ny, nz]) * box
                d = d0 + shift
                r = np.sqrt((d * d).sum(1))
                e_real += float(np.sum(
                    np.where(keep, ELEC_FACTOR * q[iu] * q[ju]
                             * erfc(alpha * r) / r, 0.0)
                ))
                if (nx, ny, nz) != (0, 0, 0):
                    # half the self-image interactions (i == j images)
                    rs = np.linalg.norm(shift)
                    e_real += 0.5 * float(np.sum(
                        ELEC_FACTOR * q * q * erfc(alpha * rs) / rs
                    ))

    # reciprocal: direct k loop
    e_rec = 0.0
    kx, ky, kz = (int(k) for k in kmax)
    for mx in range(-kx, kx + 1):
        for my in range(-ky, ky + 1):
            for mz in range(-kz, kz + 1):
                if mx == 0 and my == 0 and mz == 0:
                    continue
                kv = 2.0 * np.pi * np.array(
                    [mx / box[0], my / box[1], mz / box[2]]
                )
                k2 = float(kv @ kv)
                phase = pos @ kv
                s_re = float(np.sum(q * np.cos(phase)))
                s_im = float(np.sum(q * np.sin(phase)))
                e_rec += (
                    ELEC_FACTOR * (2.0 * np.pi / V)
                    * np.exp(-k2 / (4.0 * alpha**2)) / k2
                    * (s_re * s_re + s_im * s_im)
                )

    e_self = -ELEC_FACTOR * alpha / np.sqrt(np.pi) * float(np.sum(q * q))
    e_net = -ELEC_FACTOR * np.pi / (2.0 * V * alpha**2) \
        * float(np.sum(q)) ** 2

    e_excl = 0.0
    for i, j in excl_pairs:
        d = _minimum_image(pos[int(i)] - pos[int(j)], box)
        r = float(np.linalg.norm(d))
        e_excl -= ELEC_FACTOR * q[int(i)] * q[int(j)] * erf(alpha * r) / r

    return e_real + e_rec + e_self + e_net + e_excl


def gb_obc_energy(q, radii, screen, pos, sa=True, cutoff=None,
                  eps_out=78.5, eps_in=1.0, offset=0.09,
                  obc=(1.0, 0.8, 4.85), ace_sigma=0.0054, probe=1.4):
    """OBC-II generalized Born + ACE surface area with explicit per-atom
    loops (independent of gb.py's dense masked-matrix formulation).
    Physics definition: Onufriev, Bashford & Case 2004 eqs. 4-8;
    HCT integral Hawkins, Cramer & Truhlar 1995 eq. 7."""
    q = np.asarray(q, np.float64)
    radii = np.asarray(radii, np.float64)
    screen = np.asarray(screen, np.float64)
    pos = np.asarray(pos, np.float64)
    n = len(q)
    rho = radii - offset
    S = screen * rho
    a, b, g = obc

    B = np.zeros(n)
    for i in range(n):
        I = 0.0
        for j in range(n):
            if j == i:
                continue
            r = float(np.linalg.norm(pos[i] - pos[j]))
            if cutoff is not None and r > cutoff:
                continue
            if rho[i] >= r + S[j]:
                continue
            L = max(abs(r - S[j]), rho[i])
            U = r + S[j]
            t = (
                1.0 / L - 1.0 / U
                + 0.25 * r * (1.0 / U**2 - 1.0 / L**2)
                + (0.5 / r) * np.log(L / U)
                + (0.25 * S[j] ** 2 / r) * (1.0 / L**2 - 1.0 / U**2)
            )
            if rho[i] < S[j] - r:
                t += 2.0 * (1.0 / rho[i] - 1.0 / L)
            I += t
        psi = 0.5 * I * rho[i]
        th = np.tanh(a * psi - b * psi**2 + g * psi**3)
        B[i] = 1.0 / (1.0 / rho[i] - th / radii[i])

    pref = -0.5 * ELEC_FACTOR * (1.0 / eps_in - 1.0 / eps_out)
    e = 0.0
    for i in range(n):
        for j in range(n):
            r2 = float(np.sum((pos[i] - pos[j]) ** 2))
            if cutoff is not None and i != j and r2 > cutoff**2:
                continue
            f = np.sqrt(
                r2 + B[i] * B[j] * np.exp(-r2 / (4.0 * B[i] * B[j]))
            )
            e += pref * q[i] * q[j] / f
    if sa:
        for i in range(n):
            e += ace_sigma * 4.0 * np.pi * (radii[i] + probe) ** 2 \
                * (radii[i] / B[i]) ** 6
    return float(e)


def gb_fd_forces(q, radii, screen, pos, atoms, h=1e-5, **kw):
    """Central-difference GB forces for a subset of atoms."""
    pos = np.asarray(pos, np.float64)
    out = {}
    for a in atoms:
        f = np.zeros(3)
        for d in range(3):
            pp = pos.copy(); pp[a, d] += h
            pm = pos.copy(); pm[a, d] -= h
            f[d] = -(gb_obc_energy(q, radii, screen, pp, **kw)
                     - gb_obc_energy(q, radii, screen, pm, **kw)) / (2 * h)
        out[int(a)] = f.tolist()
    return out


def tip4p_reconstruct(pos, sites, hosts, params):
    """Numpy reconstruction of GROMACS virtual_sites3 funct 1 (linear
    combination) sites: r = (1-a-b) r_i + a r_j + b r_k."""
    out = np.asarray(pos, np.float64).copy()
    for s, (i, j, k), (av, bv) in zip(sites, hosts, params):
        out[s] = (1.0 - av - bv) * out[i] + av * out[j] + bv * out[k]
    return out


def vsite_nonbonded_energy(q, sig, eps, pos, box, keep_mask, cutoff,
                           switch_dist=None, rfa=False,
                           solvent_dielectric=78.5):
    """LJ + electrostatics over an explicit pair loop with a supplied
    keep mask (exclusions are topology DATA; the math under test is the
    evaluation + the vsite force spreading)."""
    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    iu, ju = np.triu_indices(n, k=1)
    sel = np.asarray(keep_mask)[iu, ju]
    i, j = iu[sel], ju[sel]
    dv = _minimum_image(pos[j] - pos[i], box)
    r = np.sqrt((dv * dv).sum(1))
    if cutoff is not None:
        inside = r <= cutoff
        i, j, r = i[inside], j[inside], r[inside]
    s = 0.5 * (np.asarray(sig)[i] + np.asarray(sig)[j])
    e2 = np.sqrt(np.abs(np.asarray(eps)[i] * np.asarray(eps)[j]))
    sr6 = (s / r) ** 6
    elj = 4.0 * e2 * (sr6 * sr6 - sr6)
    if switch_dist is not None and cutoff is not None:
        x = np.clip((r - switch_dist) / (cutoff - switch_dist), 0.0, 1.0)
        sw = 1.0 + x * x * x * (-10.0 + x * (15.0 - 6.0 * x))
        elj = np.where(r > switch_dist, elj * sw, elj)
    qv = np.asarray(q, np.float64)
    qq = ELEC_FACTOR * qv[i] * qv[j]
    if rfa and cutoff:
        eps_rf = solvent_dielectric
        krf = (1.0 / cutoff**3) * (eps_rf - 1.0) / (2.0 * eps_rf + 1.0)
        crf = (1.0 / cutoff) * (3.0 * eps_rf) / (2.0 * eps_rf + 1.0)
        e_el = float(np.sum(qq * (1.0 / r + krf * r * r - crf)))
    else:
        e_el = float(np.sum(qq / r))
    return float(np.sum(elj)) + e_el


def vsite_fd_forces(q, sig, eps, pos_hosts, box, keep_mask, cutoff,
                    sites, hosts, vparams, atoms, h=1e-5, **kw):
    """FD forces wrt HOST coordinates with the site re-reconstructed
    inside each displaced evaluation -- the independent check of the
    engine's vjp force spreading."""
    pos_hosts = np.asarray(pos_hosts, np.float64)
    out = {}
    for a in atoms:
        f = np.zeros(3)
        for d in range(3):
            pp = pos_hosts.copy(); pp[a, d] += h
            pm = pos_hosts.copy(); pm[a, d] -= h
            ep = vsite_nonbonded_energy(
                q, sig, eps, tip4p_reconstruct(pp, sites, hosts, vparams),
                box, keep_mask, cutoff, **kw)
            em = vsite_nonbonded_energy(
                q, sig, eps, tip4p_reconstruct(pm, sites, hosts, vparams),
                box, keep_mask, cutoff, **kw)
            f[d] = -(ep - em) / (2.0 * h)
        out[int(a)] = f.tolist()
    return out
