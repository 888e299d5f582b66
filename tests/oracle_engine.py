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


# ----------------------------------------------------------------------
# v3 families: permanent multipoles, Thole induced-dipole SCF, Drude,
# CMAP (round-5 oracle extension -- the polarizable stack's second
# engine; VERDICT.md round-4 item 5)
# ----------------------------------------------------------------------

def _frames_loop(pos, sites, frame_kind, z_atom, x_atom, box=None):
    """Local->lab rotations via per-site scalar Gram-Schmidt loops
    (independent of multipoles.lab_frames' vectorized formulation).
    Frame definitions are SPEC (Ren & Ponder 2003): kind 0 = lab,
    1 = z-then-x, 2 = bisector. Columns of R are (ex, ey, ez)."""
    out = []
    for i in range(len(sites)):
        k = int(frame_kind[i])
        if k == 0:
            out.append(np.eye(3))
            continue
        a = int(sites[i])
        vz = _minimum_image(pos[int(z_atom[i])] - pos[a], box)
        vx = _minimum_image(pos[int(x_atom[i])] - pos[a], box)
        if k == 2:
            ez = vz / np.linalg.norm(vz) + vx / np.linalg.norm(vx)
        else:
            ez = vz.copy()
        ez = ez / np.linalg.norm(ez)
        ex = vx - np.dot(vx, ez) * ez
        ex = ex / np.linalg.norm(ex)
        ey = np.cross(ez, ex)
        out.append(np.stack([ex, ey, ez], axis=1))
    return np.asarray(out)


def _lab_moments(pos, sites, mu_local, frame_kind, z_atom, x_atom,
                 quad_local=None, box=None):
    R = _frames_loop(pos, sites, frame_kind, z_atom, x_atom, box)
    ns = len(sites)
    mu = np.zeros((ns, 3))
    Q = np.zeros((ns, 3, 3))
    for i in range(ns):
        mu[i] = R[i] @ np.asarray(mu_local[i], np.float64)
        if quad_local is not None:
            Q[i] = R[i] @ np.asarray(quad_local[i], np.float64) @ R[i].T
    return mu, Q


def multipole_energy(charges, pos, sites, mu_local, frame_kind, z_atom,
                     x_atom, nb_mask, quad_local=None, box=None,
                     cutoff=None):
    """Permanent multipole interaction energy (kcal/mol) via
    hand-derived T-tensor contractions in explicit python loops --
    independent of multipoles.Multipoles.energy_fn, which derives every
    quadrupole cross term by jax AD of the source potential.

    Interaction classes (matching the engine's registry; monopole-
    monopole is deliberately absent -- the engine's point-charge term
    owns it):
      charge-dipole   q_j (mu_i . r) / r^3            (r = x_j - x_i)
      dipole-dipole   [mu_i.mu_j - 3 (mu_i.rh)(mu_j.rh)] / r^3 (pairs once)
      charge-quad     q_j (r.Q_i.r) / (2 r^5)
      dipole-quad     mu_j . grad phi_Qi(r)            (ordered pairs)
      quad-quad       (1/6) Q_j : hess phi_Qi(r)       (pairs once)
    with phi_Q(r) = (r.Q.r)/(2 r^5), Q traceless (Jackson). Returns a
    dict of per-class energies + 'total'."""
    pos = np.asarray(pos, np.float64)
    q = np.asarray(charges, np.float64)
    mask = np.asarray(nb_mask, bool)
    sites = np.asarray(sites, int)
    ns = len(sites)
    n = len(q)
    mu, Q = _lab_moments(pos, sites, mu_local, frame_kind, z_atom,
                         x_atom, quad_local, box)

    e_qd = e_dd = e_qc = e_qmu = e_qq = 0.0
    for i in range(ns):
        a = int(sites[i])
        for j in range(n):
            if not mask[a, j]:
                continue
            r = _minimum_image(pos[j] - pos[a], box)
            rn = np.linalg.norm(r)
            if cutoff is not None and rn > cutoff:
                continue
            e_qd += ELEC_FACTOR * q[j] * np.dot(mu[i], r) / rn ** 3
            if quad_local is not None:
                e_qc += ELEC_FACTOR * q[j] * (r @ Q[i] @ r) \
                    / (2.0 * rn ** 5)
    for i in range(ns):
        for j in range(ns):
            if i == j:
                continue
            a, b = int(sites[i]), int(sites[j])
            if not mask[a, b]:
                continue
            r = _minimum_image(pos[b] - pos[a], box)   # i -> j
            rn = np.linalg.norm(r)
            if cutoff is not None and rn > cutoff:
                continue
            if quad_local is not None:
                # dipole-quad, both orderings (engine sums ordered pairs)
                grad_phi = (Q[i] @ r) / rn ** 5 \
                    - 2.5 * (r @ Q[i] @ r) * r / rn ** 7
                e_qmu += ELEC_FACTOR * np.dot(mu[j], grad_phi)
            if i < j:
                rh = r / rn
                e_dd += ELEC_FACTOR * (
                    np.dot(mu[i], mu[j])
                    - 3.0 * np.dot(mu[i], rh) * np.dot(mu[j], rh)
                ) / rn ** 3
                if quad_local is not None:
                    Si = r @ Q[i] @ r
                    Sj = r @ Q[j] @ r
                    e_qq += ELEC_FACTOR / 6.0 * (
                        np.trace(Q[j] @ Q[i]) / rn ** 5
                        - 10.0 * (r @ Q[j] @ Q[i] @ r) / rn ** 7
                        + 17.5 * Si * Sj / rn ** 9
                    )
    out = {"charge_dipole": e_qd, "dipole_dipole": e_dd,
           "charge_quad": e_qc, "dipole_quad": e_qmu, "quad_quad": e_qq}
    out["total"] = sum(out.values())
    return out


def multipole_point_charge_energy(charges, pos, sites, mu_local,
                                  frame_kind, z_atom, x_atom, nb_mask,
                                  quad_local=None, box=None, d=5e-3):
    """Derivation-independent cross-check of multipole_energy: realize
    every dipole as a +-|mu|/(2d) charge pair and every traceless
    quadrupole as 6 charges lam_k/(6 d^2) at +-d v_k along its
    eigenvectors (monopole and dipole of the arrangement vanish exactly;
    leading error is the octupole, O(d^2)), sum bare Coulomb over the
    masked pairs, and subtract the monopole-monopole part. Richardson-
    extrapolate externally with two d values. Open boundaries only."""
    assert box is None, "point-charge cross-check is open-boundary only"
    pos = np.asarray(pos, np.float64)
    q = np.asarray(charges, np.float64)
    mask = np.asarray(nb_mask, bool)
    sites = np.asarray(sites, int)
    n = len(q)
    mu, Q = _lab_moments(pos, sites, mu_local, frame_kind, z_atom,
                         x_atom, quad_local, box)

    # per-atom charge clouds: list of (offset, charge); monopole first
    clouds = [[(np.zeros(3), q[a])] for a in range(n)]
    for i, a in enumerate(sites):
        m = np.linalg.norm(mu[i])
        if m > 0:
            u = mu[i] / m
            clouds[int(a)].append((d * u, m / (2.0 * d)))
            clouds[int(a)].append((-d * u, -m / (2.0 * d)))
        if quad_local is not None and np.any(Q[i] != 0.0):
            lam, V = np.linalg.eigh(Q[i])
            for k in range(3):
                qk = lam[k] / (6.0 * d * d)
                clouds[int(a)].append((d * V[:, k], qk))
                clouds[int(a)].append((-d * V[:, k], qk))

    # exact (fsum) accumulation: the discretization charges are
    # O(lam / d^2) and cancel massively -- naive summation would lose
    # the answer to rounding
    import math

    terms = []
    for a in range(n):
        for b in range(a + 1, n):
            if not mask[a, b]:
                continue
            for ka, (oa, qa) in enumerate(clouds[a]):
                if qa == 0.0:
                    continue
                for kb, (ob, qb) in enumerate(clouds[b]):
                    if qb == 0.0:
                        continue
                    if ka == 0 and kb == 0:
                        continue      # monopole-monopole excluded
                    r = np.linalg.norm(pos[b] + ob - (pos[a] + oa))
                    terms.append(ELEC_FACTOR * qa * qb / r)
    return math.fsum(terms)


def multipole_fd_forces(charges, pos, sites, mu_local, frame_kind,
                        z_atom, x_atom, nb_mask, atoms, quad_local=None,
                        box=None, cutoff=None, h=1e-5):
    """Central-difference forces of multipole_energy for a subset of
    atoms, frames re-resolved per displacement (the independent check of
    the engine's AD torque transfer through the rotation matrices)."""
    pos = np.asarray(pos, np.float64)
    out = {}
    for a in atoms:
        f = np.zeros(3)
        for dd in range(3):
            pp = pos.copy(); pp[a, dd] += h
            pm = pos.copy(); pm[a, dd] -= h
            ep = multipole_energy(charges, pp, sites, mu_local,
                                  frame_kind, z_atom, x_atom, nb_mask,
                                  quad_local, box, cutoff)["total"]
            em = multipole_energy(charges, pm, sites, mu_local,
                                  frame_kind, z_atom, x_atom, nb_mask,
                                  quad_local, box, cutoff)["total"]
            f[dd] = -(ep - em) / (2.0 * h)
        out[int(a)] = f.tolist()
    return out


def _perm_field_loop(charges, pos, sites, mu, Q, pol_sites, perm_mask,
                     box=None, cutoff=None):
    """Field (raw Gaussian units, e/A^2) at each polarizable site from
    the permanent monopole+dipole+quadrupole of every source site the
    (npol, ns) perm_mask allows, via hand-written field formulas (the
    engine derives them by AD of the source potential)."""
    pos = np.asarray(pos, np.float64)
    q = np.asarray(charges, np.float64)
    E = np.zeros((len(pol_sites), 3))
    for i, a in enumerate(pol_sites):
        for j, b in enumerate(sites):
            if not perm_mask[i, j]:
                continue
            dv = _minimum_image(pos[int(a)] - pos[int(b)], box)
            r = np.linalg.norm(dv)
            if cutoff is not None and r > cutoff:
                continue
            E[i] += q[int(b)] * dv / r ** 3
            E[i] += (3.0 * np.dot(mu[j], dv) * dv / r ** 2 - mu[j]) \
                / r ** 3
            if Q is not None:
                E[i] += 2.5 * (dv @ Q[j] @ dv) * dv / r ** 7 \
                    - (Q[j] @ dv) / r ** 5
    return E


def thole_polarization_solve(charges, pos, sites, mu_local, frame_kind,
                             z_atom, x_atom, quad_local, pol_sites,
                             alpha, thole, perm_mask, box=None,
                             cutoff=None):
    """Thole mutual induced dipoles by DENSE direct solve (np.linalg.solve
    on the full (3 npol, 3 npol) matrix -- independent of the engine's
    matrix-free CG) and the polarization energy -EF/2 sum mu.E_perm.

    Returns (energy_kcal, mu_induced (npol, 3) e*A, E_perm (npol, 3)).
    Thole damping (Thole 1981, AMOEBA form): lam3 = 1 - exp(-a u^3),
    lam5 = 1 - (1 + a u^3) exp(-a u^3), u = r / (alpha_i alpha_j)^(1/6),
    a = min(thole_i, thole_j); damping applies to the mutual coupling
    only (the engine's convention -- permanent fields use group masks)."""
    pos = np.asarray(pos, np.float64)
    alpha = np.asarray(alpha, np.float64)
    thole = np.asarray(thole, np.float64)
    npol = len(pol_sites)
    mu_p, Q_p = _lab_moments(pos, sites, mu_local, frame_kind, z_atom,
                             x_atom, quad_local, box)
    E = _perm_field_loop(charges, pos, sites, mu_p,
                         None if quad_local is None else Q_p,
                         pol_sites, perm_mask, box, cutoff)

    A = np.zeros((3 * npol, 3 * npol))
    for i in range(npol):
        A[3 * i:3 * i + 3, 3 * i:3 * i + 3] = np.eye(3) / alpha[i]
    for i in range(npol):
        for j in range(npol):
            if i == j:
                continue
            dv = _minimum_image(
                pos[int(pol_sites[i])] - pos[int(pol_sites[j])], box
            )
            r = np.linalg.norm(dv)
            if cutoff is not None and r > cutoff:
                continue
            a_d = min(thole[i], thole[j])
            u3 = (r / (alpha[i] * alpha[j]) ** (1.0 / 6.0)) ** 3
            ex = np.exp(-a_d * u3)
            lam3 = 1.0 - ex
            lam5 = 1.0 - (1.0 + a_d * u3) * ex
            T = 3.0 * lam5 * np.outer(dv, dv) / r ** 5 \
                - lam3 * np.eye(3) / r ** 3
            A[3 * i:3 * i + 3, 3 * j:3 * j + 3] = -T
    mu_ind = np.linalg.solve(A, E.reshape(-1)).reshape(npol, 3)
    energy = -0.5 * ELEC_FACTOR * float(np.sum(mu_ind * E))
    return energy, mu_ind, E


def polarization_fd_forces(charges, pos, sites, mu_local, frame_kind,
                           z_atom, x_atom, quad_local, pol_sites, alpha,
                           thole, perm_mask, atoms, box=None,
                           cutoff=None, h=1e-5):
    """Central-difference forces of the polarization energy (the full
    pipeline -- frames, permanent field, dense solve -- re-run per
    displacement): the independent check of the engine's envelope-
    theorem gradients through the CG solve."""
    pos = np.asarray(pos, np.float64)
    out = {}
    for a in atoms:
        f = np.zeros(3)
        for dd in range(3):
            pp = pos.copy(); pp[a, dd] += h
            pm = pos.copy(); pm[a, dd] -= h
            ep = thole_polarization_solve(
                charges, pp, sites, mu_local, frame_kind, z_atom, x_atom,
                quad_local, pol_sites, alpha, thole, perm_mask, box,
                cutoff)[0]
            em = thole_polarization_solve(
                charges, pm, sites, mu_local, frame_kind, z_atom, x_atom,
                quad_local, pol_sites, alpha, thole, perm_mask, box,
                cutoff)[0]
            f[dd] = -(ep - em) / (2.0 * h)
        out[int(a)] = f.tolist()
    return out


# -- Drude oscillators -------------------------------------------------

def drude_extended_energy(charges, alpha, nb_mask, pos_ext, k_drude,
                          thole=2.6, box=None):
    """Total energy of a Drude-extended system, constructed from first
    principles (independent of drude.make_drude_ffparams' table
    surgery): q_D = -sqrt(2 k alpha / EF); core keeps q - q_D; the
    extended pair mask inherits the parent pattern with same-oscillator
    core-Drude pairs removed; springs E = k d^2; bonded-excluded
    oscillator pairs interact through the four Thole-damped charge
    pairs S(u) qq / r with S(u) = 1 - (1 + u/2) e^-u,
    u = (a_i + a_j) r / (alpha_i alpha_j)^(1/6), a_i = thole/2.

    LJ is assumed zero (zero-epsilon types), matching the case builder.
    Returns a dict {coulomb, spring, thole, total}."""
    q = np.asarray(charges, np.float64)
    alpha = np.asarray(alpha, np.float64)
    mask = np.asarray(nb_mask, bool)
    n = len(q)
    pol = np.flatnonzero(alpha > 0)
    npol = len(pol)
    drude = n + np.arange(npol)
    q_d = -np.sqrt(2.0 * k_drude * alpha[pol] / ELEC_FACTOR)
    q_ext = np.concatenate([q, q_d])
    q_ext[pol] = q[pol] - q_d

    mask_ext = np.zeros((n + npol, n + npol), bool)
    mask_ext[:n, :n] = mask
    mask_ext[n:, :n] = mask[pol, :]
    mask_ext[:n, n:] = mask[:, pol]
    mask_ext[n:, n:] = mask[np.ix_(pol, pol)]
    mask_ext[pol, drude] = False
    mask_ext[drude, pol] = False
    np.fill_diagonal(mask_ext, False)

    pos_ext = np.asarray(pos_ext, np.float64)
    e_coul = 0.0
    for a in range(n + npol):
        for b in range(a + 1, n + npol):
            if not mask_ext[a, b]:
                continue
            r = np.linalg.norm(
                _minimum_image(pos_ext[b] - pos_ext[a], box)
            )
            e_coul += ELEC_FACTOR * q_ext[a] * q_ext[b] / r

    e_spring = 0.0
    for i in range(npol):
        d = np.linalg.norm(
            _minimum_image(pos_ext[drude[i]] - pos_ext[pol[i]], box)
        )
        e_spring += k_drude * d * d

    e_thole = 0.0
    sub_excl = ~mask[np.ix_(pol, pol)]
    for i in range(npol):
        for j in range(i + 1, npol):
            if not sub_excl[i, j]:
                continue
            coeff = thole / (alpha[pol[i]] * alpha[pol[j]]) ** (1.0 / 6.0)
            for ia, qa in ((pol[i], -q_d[i]), (drude[i], q_d[i])):
                for jb, qb in ((pol[j], -q_d[j]), (drude[j], q_d[j])):
                    r = np.linalg.norm(
                        _minimum_image(pos_ext[jb] - pos_ext[ia], box)
                    )
                    u = coeff * r
                    s = 1.0 - (1.0 + 0.5 * u) * np.exp(-u)
                    e_thole += s * ELEC_FACTOR * qa * qb / r
    return {"coulomb": e_coul, "spring": e_spring, "thole": e_thole,
            "total": e_coul + e_spring + e_thole}


def drude_scf(charges, alpha, nb_mask, pos, k_drude, thole=2.6,
              box=None, iters=500, gtol=1e-9, h=1e-6):
    """Relax the Drude coordinates by damped-Newton iterations with
    CENTRAL-DIFFERENCE gradients (no analytic derivatives anywhere):
    step = g / (2 k). Returns (pos_ext_relaxed, energy, mu_induced)
    with mu_induced[i] = q_D_i * (x_D_i - x_core_i) in e*A."""
    q = np.asarray(charges, np.float64)
    alpha = np.asarray(alpha, np.float64)
    n = len(q)
    pol = np.flatnonzero(alpha > 0)
    npol = len(pol)
    drude = n + np.arange(npol)
    q_d = -np.sqrt(2.0 * k_drude * alpha[pol] / ELEC_FACTOR)
    pos_ext = np.concatenate(
        [np.asarray(pos, np.float64), np.asarray(pos, np.float64)[pol]]
    )

    def etot(p):
        return drude_extended_energy(q, alpha, nb_mask, p, k_drude,
                                     thole, box)["total"]

    for _ in range(iters):
        g = np.zeros((npol, 3))
        for i in range(npol):
            for dd in range(3):
                pp = pos_ext.copy(); pp[drude[i], dd] += h
                pm = pos_ext.copy(); pm[drude[i], dd] -= h
                g[i, dd] = (etot(pp) - etot(pm)) / (2.0 * h)
        if np.abs(g).max() < gtol:
            break
        pos_ext[drude] -= g / (2.0 * k_drude)
    mu_ind = q_d[:, None] * (pos_ext[drude] - pos_ext[pol])
    return pos_ext, etot(pos_ext), mu_ind


# -- CMAP --------------------------------------------------------------

def cmap_energy_scipy(grids, idx, types, pos, box=None):
    """CMAP correction energy via scipy tensor-product PERIODIC cubic
    splines (CubicSpline bc_type='periodic' applied along psi for every
    phi node, then along phi) -- the periodic bicubic interpolant is
    unique, so this must agree with the engine's cyclic-tridiagonal +
    16-coefficient construction to rounding.

    grids: list of (n, n) maps E(phi_i, psi_j), phi_i = -pi + i 2pi/n;
    idx: (nc, 8) atom indices of the two dihedrals; types: (nc,)."""
    from scipy.interpolate import CubicSpline

    pos = np.asarray(pos, np.float64)
    idx = np.asarray(idx, int)
    types = np.asarray(types, int)
    e = 0.0
    for c in range(idx.shape[0]):
        g = np.asarray(grids[types[c]], np.float64)
        n = g.shape[0]
        nodes = -np.pi + np.arange(n + 1) * (2.0 * np.pi / n)
        phi = float(_torsion_phi(pos, idx[c:c + 1, 0:4], box)[0])
        psi = float(_torsion_phi(pos, idx[c:c + 1, 4:8], box)[0])
        # spline along psi at every phi node, evaluated at psi
        gwrap = np.concatenate([g, g[:, :1]], axis=1)
        vals = np.array([
            CubicSpline(nodes, gwrap[i], bc_type="periodic")(psi)
            for i in range(n)
        ])
        vals = np.concatenate([vals, vals[:1]])
        e += float(CubicSpline(nodes, vals, bc_type="periodic")(phi))
    return e


def cmap_fd_forces(grids, idx, types, pos, atoms, box=None, h=1e-5):
    """Central-difference CMAP forces for a subset of atoms."""
    pos = np.asarray(pos, np.float64)
    out = {}
    for a in atoms:
        f = np.zeros(3)
        for dd in range(3):
            pp = pos.copy(); pp[a, dd] += h
            pm = pos.copy(); pm[a, dd] -= h
            f[dd] = -(cmap_energy_scipy(grids, idx, types, pp, box)
                      - cmap_energy_scipy(grids, idx, types, pm, box)) \
                / (2.0 * h)
        out[int(a)] = f.tolist()
    return out
