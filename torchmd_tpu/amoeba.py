"""AMOEBA force-field file ingestion + Thole induced-dipole polarization.

Completes the multipole stack (torchmd_tpu.multipoles: permanent dipoles/
quadrupoles with local frames) into a runnable polarizable model loaded
from published TINKER/AMOEBA parameter files:

  - `parse_tinker_prm` reads `multipole` records (via
    multipoles.parse_tinker_multipoles), `polarize` records and `atom`
    type definitions from a TINKER .prm,
  - `read_tinker_xyz` reads the TINKER .xyz/.arc coordinate format
    (which carries per-atom TINKER types and full connectivity -- the
    natural end-to-end input for AMOEBA systems),
  - `resolve_frames` maps per-TYPE multipole records onto per-ATOM local
    frames by matching z-/x-axis types against the bonded (1-2, then
    1-3) neighbourhood,
  - `make_amoeba_electrostatics` converts units and builds one
    external-potential object: permanent multipoles (reusing
    `Multipoles.energy_fn`) plus Thole-damped mutual induced-dipole
    polarization solved by matrix-free conjugate gradients inside jit.

Unit conventions (TINKER file -> this module's internal units):

  - dipoles: files store e*Bohr -> multiply by BOHR = 0.52917721067 to
    get e*Angstrom.
  - quadrupoles: files store the traceless second moment
    T_ab = sum q (r_a r_b - r^2 d_ab / 3) in e*Bohr^2 (TINKER's
    internal polytensor convention divides file values by 3).
    `multipoles.MultipoleSpec` uses the Jackson convention
    Q_ab = sum q (3 r_a r_b - r^2 d_ab) = 3 * T, so file values are
    multiplied by 3 * BOHR^2. This factor is pinned empirically: with
    it, the AMOEBA water monomer's total molecular quadrupole about the
    COM comes out (2.71, -2.58, -0.13) D*A at the gas-phase geometry,
    matching the experimental values the model was fit to
    (2.63, -2.50, -0.13; Verhoeven & Dymanus) -- candidate factors
    1 or 2 land 0.3-0.7 D*A away (tests/test_amoeba.py).
  - polarizabilities: files store Angstrom^3 (no conversion).

Golden anchor: the AMOEBA water (water03) monomer built from its
published .prm fragment reproduces the model's stated permanent dipole
moment of 1.77 D (Ren & Ponder, J. Phys. Chem. B 107, 5933 (2003)).

Polarization model implemented (and its honest scope):

  - mutual induced point dipoles mu_i = alpha_i E_i with Thole damping:
    lambda3 = 1 - exp(-a u^3), lambda5 = 1 - (1 + a u^3) exp(-a u^3),
    u = r / (alpha_i alpha_j)^(1/6), a = min(thole_i, thole_j) -- the
    AMOEBA/TINKER damping form,
  - the permanent field driving induction excludes pairs within the same
    polarization group (AMOEBA's group-based d-scaling with d(intra)=0),
    and the same masking is used for the energy (p == d). For systems
    whose polarization groups are whole molecules (water and other
    rigid-fragment models) this is exactly AMOEBA; for polymers AMOEBA's
    connectivity-based p-scaling differs and is not implemented.
  - energy from the variational functional
    U(mu) = 1/2 mu a^-1 mu - 1/2 mu T mu - mu.E_perm, evaluated at the
    CG solution with stop_gradient(mu): the envelope theorem then makes
    jax.grad forces exact (second order in any CG residual).
  - under ewald=True the solver upgrades to `AmoebaPolarizationEwald`:
    both the direct field and the mutual coupling become the PERIODIC
    Ewald interactions (including the PME mesh when the permanent
    engine is MultipolePme) by injecting the induced dipoles into the
    quadratic engine tiers -- the polarization reciprocal of Sagui,
    Pedersen & Darden, JCP 120:73 (2004).

The reference has no polarizable electrostatics of any kind (fixed
point charges only, torchmd/forces.py:453-491); this subsystem is
capability beyond it.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .potentials import ELEC_FACTOR, wrap_displacement
from .multipoles import (
    Multipoles,
    lab_dipoles,
    lab_quadrupoles,
    make_multipoles,
    parse_tinker_multipoles,
)

BOHR = 0.52917721067          # Angstrom (CODATA; TINKER uses this scale)
DEBYE = 4.80320425            # 1 e*Angstrom in Debye


# ----------------------------------------------------------------------
# File parsing
# ----------------------------------------------------------------------

def parse_tinker_prm(text):
    """Parse the AMOEBA-relevant records of a TINKER .prm file.

    Returns dict with:
      "multipoles": {type: {...}} (see multipoles.parse_tinker_multipoles)
      "polarize":   {type: {"alpha": A^3, "thole": float,
                            "group_types": [int, ...]}}
      "atoms":      {type: {"class": int, "name": str, "mass": float}}
    """
    out = {"multipoles": parse_tinker_multipoles(text),
           "polarize": {}, "atoms": {}, "vdw": {}, "_text": text}
    for raw in text.splitlines():
        ln = raw.split("#")[0].strip()
        if not ln:
            continue
        parts = ln.split()
        key = parts[0].lower()
        if key == "vdw":
            # vdw  class  rmin-diameter(A)  epsilon(kcal/mol)  [reduction]
            cls = int(parts[1])
            out["vdw"][cls] = {
                "rmin": float(parts[2]),
                "eps": float(parts[3]),
                "reduction": float(parts[4]) if len(parts) > 4 else 1.0,
            }
        elif key == "polarize":
            t = int(parts[1])
            alpha = float(parts[2])
            thole = float(parts[3])
            groups = [int(p) for p in parts[4:] if _is_int(p)]
            out["polarize"][t] = {
                "alpha": alpha, "thole": thole, "group_types": groups,
            }
        elif key == "atom":
            # atom  type  class  name  "description"  Z  mass  valence
            t = int(parts[1])
            cls = int(parts[2])
            name = parts[3]
            nums = [p for p in parts[4:] if _is_float(p)]
            mass = float(nums[-2]) if len(nums) >= 2 else 0.0
            out["atoms"][t] = {"class": cls, "name": name, "mass": mass}
    return out


def _is_int(s):
    try:
        int(s)
        return True
    except ValueError:
        return False


def _is_float(s):
    try:
        float(s)
        return True
    except ValueError:
        return False


def read_tinker_xyz(path_or_text):
    """Read a TINKER .xyz frame: returns (coords (N,3) float64,
    types (N,) int, bonds (nb,2) int, box (3,) or None).

    Format: `natoms [title]`; optionally a box line (6 floats: lengths +
    angles); then per atom: `idx name x y z type bonded...`.
    Orthorhombic boxes only (angles must be 90)."""
    if "\n" in str(path_or_text):
        lines = str(path_or_text).splitlines()
    else:
        with open(path_or_text) as fh:
            lines = fh.read().splitlines()
    lines = [ln for ln in (s.strip() for s in lines) if ln]
    n = int(lines[0].split()[0])
    i = 1
    box = None
    parts = lines[i].split()
    if len(parts) == 6 and all(_is_float(p) for p in parts):
        vals = [float(p) for p in parts]
        if not all(abs(a - 90.0) < 1e-6 for a in vals[3:]):
            raise ValueError("only orthorhombic TINKER boxes supported")
        box = np.asarray(vals[:3])
        i += 1
    coords = np.zeros((n, 3))
    types = np.zeros(n, dtype=np.int64)
    bonds = set()
    for k in range(n):
        p = lines[i + k].split()
        idx = int(p[0]) - 1
        coords[idx] = [float(p[2]), float(p[3]), float(p[4])]
        types[idx] = int(p[5])
        for b in p[6:]:
            j = int(b) - 1
            bonds.add((min(idx, j), max(idx, j)))
    bonds = np.asarray(sorted(bonds), dtype=np.int64).reshape(-1, 2)
    return coords, types, bonds, box


# ----------------------------------------------------------------------
# Frame resolution (per-type records -> per-atom local frames)
# ----------------------------------------------------------------------

def _neighbor_lists(natoms, bonds):
    n12 = [[] for _ in range(natoms)]
    for a, b in np.asarray(bonds).reshape(-1, 2):
        n12[int(a)].append(int(b))
        n12[int(b)].append(int(a))
    return n12


def resolve_frames(atom_types, bonds, records):
    """Map per-type multipole records onto atoms.

    atom_types: (natoms,) int TINKER types; bonds: (nb, 2); records:
    output of parse_tinker_multipoles. Returns a list of per-atom dicts
    (site index, frame kind, z/x atom indices, raw file-unit moments).

    Axis atoms are searched among 1-2 neighbours first (preferring ones
    not already used for another axis of the same site), then 1-3
    neighbours (through the z atom), matching TINKER's kmpole search
    order. `z-then-bisector`/`trisector` 3-axis frames are not
    implemented (raise)."""
    atom_types = np.asarray(atom_types).reshape(-1)
    natoms = len(atom_types)
    n12 = _neighbor_lists(natoms, bonds)
    out = []
    for a in range(natoms):
        t = int(atom_types[a])
        if t not in records:
            raise KeyError(f"atom {a}: no multipole record for type {t}")
        r = records[t]
        frame = r["frame"]
        z_at = x_at = a
        if frame != "none":
            zt = r["z_type"]
            zs = [b for b in n12[a] if int(atom_types[b]) == zt]
            if not zs:
                raise ValueError(
                    f"atom {a} (type {t}): no bonded neighbour of z-axis "
                    f"type {zt}"
                )
            z_at = zs[0]
            xt = r.get("x_type", 0)
            if xt:
                xs = [b for b in n12[a]
                      if b != z_at and int(atom_types[b]) == xt]
                if not xs:
                    xs = [c for c in n12[z_at]
                          if c != a and int(atom_types[c]) == xt]
                if not xs:
                    raise ValueError(
                        f"atom {a} (type {t}): no 1-2/1-3 neighbour of "
                        f"x-axis type {xt}"
                    )
                x_at = xs[0]
            elif frame == "bisector":
                raise ValueError(f"atom {a}: bisector frame needs x type")
        out.append({
            "atom": a, "frame": frame, "z": z_at, "x": x_at,
            "monopole": r["monopole"], "dipole": r["dipole"],
            "quad": r["quad"], "type": t,
        })
    return out


def _tinker_quad_to_jackson(Q_file):
    """Traceless second moment (file, e*Bohr^2) -> Jackson (e*A^2)."""
    Q = 3.0 * (BOHR ** 2) * np.asarray(Q_file, np.float64)
    # file rounding can leave a tiny trace; remove it (the spec validates)
    Q = Q - np.eye(3) * (np.trace(Q) / 3.0)
    return Q


def make_amoeba_multipoles(ffparams, atom_types, bonds, records,
                           cutoff=None, switch_dist=None):
    """Per-atom `Multipoles` evaluator + monopole charges from TINKER
    multipole records (with unit conversion). Returns
    (Multipoles, charges (natoms,) np.float64).

    The monopoles REPLACE any point charges on the topology: assign the
    returned charges to the Parameters/FFParams electrostatics term."""
    frames = resolve_frames(atom_types, bonds, records)
    dipoles = []
    charges = np.zeros(len(frames))
    for f in frames:
        charges[f["atom"]] = f["monopole"]
        d = {
            "atom": f["atom"],
            "mu": np.asarray(f["dipole"], np.float64) * BOHR,
            "frame": f["frame"],
            "quad": _tinker_quad_to_jackson(f["quad"]),
        }
        if f["frame"] != "none":
            d["z"] = f["z"]
            d["x"] = f["x"]
        dipoles.append(d)
    # the parsed monopoles feed the charge-dipole / charge-quad tiers
    # directly: ffparams.charges is typically still zero at this point
    # (the caller assigns the returned monopoles onto the point-charge
    # term afterwards), and building from ffparams.charges would
    # silently drop both tiers -- caught by the v3 oracle goldens
    # (tests/test_oracle.py::test_multipoles_match_independent_oracle)
    mp = make_multipoles(ffparams, dipoles, cutoff=cutoff,
                         switch_dist=switch_dist, charges=charges)
    return mp, charges


# ----------------------------------------------------------------------
# Thole induced-dipole polarization
# ----------------------------------------------------------------------

class PolarizationSpec(NamedTuple):
    sites: jnp.ndarray        # (np,) int32 polarizable atom rows
    alpha: jnp.ndarray        # (np,) A^3
    thole: jnp.ndarray        # (np,) damping factors
    perm_mask: jnp.ndarray    # (np, np) bool: pairs whose PERMANENT
    #                           moments polarize each other (False within
    #                           a polarization group: AMOEBA d-scale 0)
    cutoff: Optional[float] = None
    cg_iters: int = 40
    cg_tol: float = 1e-6


def polarization_groups(atom_types, bonds, polarize_records):
    """Connected components of the bond graph restricted to edges whose
    endpoint types list each other in their `polarize` group lists
    (TINKER semantics: the trailing type ints of a polarize record name
    the neighbour types belonging to the same group)."""
    atom_types = np.asarray(atom_types).reshape(-1)
    natoms = len(atom_types)
    parent = list(range(natoms))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj

    for a, b in np.asarray(bonds).reshape(-1, 2):
        ta, tb = int(atom_types[a]), int(atom_types[b])
        ga = polarize_records.get(ta, {}).get("group_types", [])
        gb = polarize_records.get(tb, {}).get("group_types", [])
        if tb in ga or ta in gb:
            union(int(a), int(b))
    return np.asarray([find(i) for i in range(natoms)])


def _thole_lambdas(d2, a_damp, alpha_i, alpha_j, dtype):
    """Thole damping factors lambda3/lambda5 for the dipole tensor."""
    r = jnp.sqrt(d2)
    s = (alpha_i * alpha_j) ** (1.0 / 6.0)
    u3 = (r / s) ** 3
    ex = jnp.exp(-a_damp * u3)
    lam3 = 1.0 - ex
    lam5 = 1.0 - (1.0 + a_damp * u3) * ex
    return lam3.astype(dtype), lam5.astype(dtype)


class AmoebaPolarization:
    """Thole mutual induced dipoles over an existing permanent-multipole
    spec. External-potential protocol object (exposes `energy_fn`)."""

    def __init__(self, mp_spec, charges, pspec: PolarizationSpec):
        self.mp_spec = mp_spec
        self.charges = jnp.asarray(charges)
        self.pspec = pspec

    # -- permanent field at the polarizable sites ----------------------
    def _perm_field(self, pos, box):
        """E_perm (np, 3): field at each polarizable site from the
        permanent moments (monopole + dipole + quadrupole) of every
        site allowed by perm_mask. Derived by AD of the source
        potential, so all moment orders stay consistent."""
        ps = self.pspec
        spec = self.mp_spec
        dtype = pos.dtype
        q = self.charges.astype(dtype)
        mu = lab_dipoles(spec, pos, box)                     # (ns, 3)
        if spec.quad_local is not None:
            Qs = lab_quadrupoles(spec, pos, box)             # (ns, 3, 3)
        else:
            Qs = jnp.zeros((spec.sites.shape[0], 3, 3), dtype)

        # sources live on spec.sites (every atom for AMOEBA); fields are
        # evaluated at ps.sites
        src = spec.sites

        def phi(dv, qj, muj, Qj):
            # potential at x (= site + dv from source j), RAW Gaussian
            # units (e/A): the Coulomb prefactor is applied once in
            # energy_fn so the SCF solve stays in consistent units
            # (mu [e*A] = alpha [A^3] * E [e/A^2])
            r2 = jnp.sum(dv * dv)
            inv_r = r2 ** -0.5
            inv_r3 = inv_r / r2
            return (
                qj * inv_r
                + jnp.dot(muj, dv) * inv_r3
                + 0.5 * jnp.dot(dv, Qj @ dv) * inv_r3 / r2
            )

        efield = jax.vmap(jax.grad(phi), in_axes=(0, 0, 0, 0))

        x_at = pos[self.pspec.sites]                          # (np, 3)
        dv = wrap_displacement(
            x_at[:, None, :] - pos[src][None, :, :], box
        )                                                     # (np, ns)
        d2 = jnp.sum(dv * dv, axis=-1)
        mask = ps.perm_mask
        if ps.cutoff is not None:
            mask = mask & (d2 <= ps.cutoff ** 2)
        dv_safe = jnp.where(mask[..., None], dv, 1.0)

        npol, ns = dv.shape[0], dv.shape[1]
        g = jax.vmap(
            lambda rows: efield(
                rows, q[src], mu, Qs
            )
        )(dv_safe)                                            # (np, ns, 3)
        E = -jnp.sum(jnp.where(mask[..., None], g, 0.0), axis=1)
        return E

    # -- Thole-damped dipole-dipole tensor applied to mu ---------------
    def _tmat_apply(self, pos, box, mu_ind):
        """(T mu)_i = sum_j T_ij mu_j with Thole damping; all site pairs
        i != j participate in mutual induction (AMOEBA u-scale)."""
        ps = self.pspec
        dtype = pos.dtype
        x = pos[ps.sites]
        npol = x.shape[0]
        dv = wrap_displacement(x[:, None, :] - x[None, :, :], box)
        d2 = jnp.sum(dv * dv, axis=-1)
        eye = jnp.eye(npol, dtype=bool)
        mask = ~eye
        if ps.cutoff is not None:
            mask = mask & (d2 <= ps.cutoff ** 2)
        d2s = jnp.where(mask, d2, 1.0)
        a_damp = jnp.minimum(ps.thole[:, None], ps.thole[None, :])
        lam3, lam5 = _thole_lambdas(
            d2s, a_damp, ps.alpha[:, None], ps.alpha[None, :], dtype
        )
        inv_r3 = d2s ** -1.5
        inv_r5 = inv_r3 / d2s
        mudotr = jnp.sum(mu_ind[None, :, :] * dv, axis=-1)    # (np, np)
        fmask = mask.astype(dtype)
        # field of dipole mu_j at i: (3 lam5 (mu.r) r / r^5 - lam3 mu/r^3)
        term = (
            3.0 * (lam5 * mudotr * inv_r5 * fmask)[..., None] * dv
            - (lam3 * inv_r3 * fmask)[..., None] * mu_ind[None, :, :]
        )
        return jnp.sum(term, axis=1)                          # (np, 3)

    def _solve_induced(self, pos, box, E):
        """CG on (alpha^-1 - T) mu = E (matrix-free, fixed-shape)."""
        ps = self.pspec
        inv_a = (1.0 / ps.alpha)[:, None]

        def A(m):
            return inv_a * m - self._tmat_apply(pos, box, m)

        mu0 = ps.alpha[:, None] * E      # direct (non-mutual) guess
        r0 = E - A(mu0)
        p0 = r0

        def body(carry):
            mu, r, p, rs, it = carry
            Ap = A(p)
            denom = jnp.sum(p * Ap)
            alpha = rs / jnp.where(denom == 0, 1.0, denom)
            mu = mu + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.sum(r * r)
            beta = rs_new / jnp.where(rs == 0, 1.0, rs)
            p = r + beta * p
            return mu, r, p, rs_new, it + 1

        def cond(carry):
            _, _, _, rs, it = carry
            return jnp.logical_and(it < ps.cg_iters, rs > ps.cg_tol ** 2)

        mu, *_ = jax.lax.while_loop(
            cond, body, (mu0, r0, p0, jnp.sum(r0 * r0), 0)
        )
        return mu

    def induced_dipoles(self, pos, box=None):
        """Converged induced dipoles (np, 3), e*A."""
        E = self._perm_field(pos, box)
        return self._solve_induced(pos, box, E)

    def energy_fn(self, pos, box=None):
        """Polarization energy with envelope-exact gradients.

        U(mu) = EF * (1/2 mu a^-1 mu - 1/2 mu T mu - mu.E), all in raw
        Gaussian units (E in e/A^2, T in A^-3, alpha in A^3); at the SCF
        solution this equals -EF/2 mu.E. Evaluating the full quadratic
        at stop_gradient(mu*) makes jax.grad exact to second order in
        the CG residual (envelope theorem)."""
        ps = self.pspec
        E = self._perm_field(pos, box)
        mu = jax.lax.stop_gradient(
            self._solve_induced(pos, box, jax.lax.stop_gradient(E))
        )
        inv_a = (1.0 / ps.alpha)[:, None]
        u_self = 0.5 * jnp.sum(mu * (inv_a * mu))
        u_mut = -0.5 * jnp.sum(mu * self._tmat_apply(pos, box, mu))
        u_perm = -jnp.sum(mu * E)
        return ELEC_FACTOR * (u_self + u_mut + u_perm)

    def calculate(self, pos, box=None):
        """Batched host-protocol fallback (reference forces.py:321-326)."""
        pos = jnp.asarray(pos)
        e, g = jax.vmap(
            jax.value_and_grad(lambda p: self.energy_fn(p, box))
        )(pos)
        return np.asarray(e), -np.asarray(g)


class AmoebaPolarizationEwald:
    """Ewald-split Thole mutual induced dipoles (polarization PME).

    The real-space `AmoebaPolarization` solves (alpha^-1 - T) mu = E
    with nearest-image bare couplings inside a cutoff. Under ewald=True
    both the direct field and the mutual coupling should be PERIODIC
    (the polarization reciprocal tier of the AMOEBA PME: Sagui,
    Pedersen & Darden, JCP 120:73, 2004). TPU-native formulation: the
    engine's tier stack is QUADRATIC in the moments, so injecting the
    induced dipoles on top of the permanent moments

        W(mu) = 1/2 mu^T alpha^-1 mu
              + [U_es(mu_perm + S mu) - U_es(mu_perm)]
              + U_pi_patch(mu) + U_mut_patch(mu)

    makes every Ewald coupling (real erfc + exclusion + self +
    reciprocal -- the PME mesh when the engine is MultipolePme) fall
    out of the SAME machinery that sums the permanent energy; no
    hand-derived Ewald field tables anywhere. The two patches are
    nearest-image re-maskings, both short-ranged or sparse:

      - U_pi_patch: coefficient (perm_mask - nb_mask) moves the direct
        (permanent -> induced) coupling from the engine's exclusion set
        to the polarization-group d-scaling, bare kernel, nearest image
        (the difference set is bonded-neighbour pairs);
      - U_mut_patch: -1/2 mu [T_thole - nb * T_bare] mu converts the
        mutual coupling to Thole-damped all-pairs (u-scale) form; for
        non-excluded pairs this is -(1 - lambda) T -> 0 at long range,
        for excluded (bonded) pairs it restores the damped nearest-
        image coupling the exclusion tier removed, while their
        periodic-image tails stay in the reciprocal sum -- exactly the
        standard AMOEBA PME exclusion treatment.

    Minimising the quadratic W is the SCF: CG with Hessian-vector
    products A(m) = grad W(m) - grad W(0) (exact for a quadratic), and
    the converged energy is W(mu*) evaluated with position gradients
    flowing at stop_gradient(mu*) -- envelope-exact forces, same
    pattern as the real-space solver."""

    def __init__(self, engine, pspec: PolarizationSpec):
        ns = int(np.asarray(engine.spec.sites).shape[0])
        natoms = int(np.asarray(engine.charges).shape[0])
        if ns != natoms:
            raise ValueError(
                "AmoebaPolarizationEwald assumes every atom is a "
                "multipole site (AMOEBA); got ns != natoms"
            )
        self.engine = engine
        self.pspec = pspec
        sites = np.asarray(pspec.sites)
        nb = np.asarray(engine.spec.nb_mask)
        src = np.asarray(engine.spec.sites)
        # direct-field re-masking: desired perm_mask vs engine nb_mask,
        # ordered (induced site i, source j); own-site coefficient 0
        c_pi = (np.asarray(pspec.perm_mask).astype(np.float64)
                - nb[sites[:, None], src[None, :]].astype(np.float64))
        c_pi[np.equal(sites[:, None], src[None, :])] = 0.0
        self._c_pi = jnp.asarray(c_pi)
        # mutual patch needs nb over site pairs
        self._nb_ss = jnp.asarray(nb[sites[:, None], sites[None, :]])

    # -- patches ---------------------------------------------------------
    def _u_pi_patch(self, pos, box, q, mu_perm, Q, mu_ind):
        """Sum of c_ij * [mu_i . grad_i][L_j] (1/r) at the nearest
        image: bare cross coupling of each induced dipole with the
        permanent moments, weighted by the re-masking coefficient."""
        from .multipole_ewald import _apply_site

        ps = self.pspec
        x_at = pos[ps.sites]
        dv = wrap_displacement(
            x_at[:, None, :] - pos[None, :, :], box
        )                                                   # (np, n, 3)
        active = jnp.abs(self._c_pi) > 0.5
        dv_safe = jnp.where(active[..., None], dv, 1.0)

        def bare(d):
            return jnp.sum(d * d) ** -0.5

        def pair(d, mi, qj, mj, Qj):
            g = _apply_site(bare, qj, mj, Qj, -1.0)
            # induced dipole only on the i side (q_i = 0, Q_i = None)
            return jnp.dot(mi, jax.grad(g)(d))

        Qz = (jnp.zeros((pos.shape[0], 3, 3), pos.dtype)
              if Q is None else Q)
        e = jax.vmap(
            lambda drow, mi: jax.vmap(
                lambda d, qj, mj, Qj: pair(d, mi, qj, mj, Qj)
            )(drow, q, mu_perm, Qz)
        )(dv_safe, mu_ind)                                  # (np, n)
        c = self._c_pi.astype(pos.dtype)
        return jnp.sum(jnp.where(active, c * e, 0.0))

    def _u_mut_patch(self, pos, box, mu_ind):
        """-1/2 mu [T_thole - nb T_bare] mu over nearest-image site
        pairs (dense; the summand decays as (1 - lambda) for included
        pairs and only bonded pairs are excluded, so no Ewald split is
        needed)."""
        ps = self.pspec
        dtype = pos.dtype
        x = pos[ps.sites]
        npol = x.shape[0]
        dv = wrap_displacement(x[:, None, :] - x[None, :, :], box)
        d2 = jnp.sum(dv * dv, axis=-1)
        mask = ~jnp.eye(npol, dtype=bool)
        d2s = jnp.where(mask, d2, 1.0)
        a_damp = jnp.minimum(ps.thole[:, None], ps.thole[None, :])
        lam3, lam5 = _thole_lambdas(
            d2s, a_damp, ps.alpha[:, None], ps.alpha[None, :], dtype
        )
        nb = self._nb_ss.astype(dtype)
        dl3 = lam3 - nb
        dl5 = lam5 - nb
        inv_r3 = d2s ** -1.5
        inv_r5 = inv_r3 / d2s
        mudotr_j = jnp.sum(mu_ind[None, :, :] * dv, axis=-1)
        mudotr_i = jnp.sum(mu_ind[:, None, :] * dv, axis=-1)
        mudotmu = jnp.sum(mu_ind[:, None, :] * mu_ind[None, :, :], -1)
        t = (3.0 * dl5 * inv_r5 * mudotr_i * mudotr_j
             - dl3 * inv_r3 * mudotmu)
        return -0.5 * jnp.sum(jnp.where(mask, t, 0.0))

    # -- quadratic functional and its CG minimisation --------------------
    def _w(self, pos, box, mu_ind):
        """W(mu) + the constant permanent part, raw units."""
        eng = self.engine
        dtype = pos.dtype
        box = jnp.asarray(box, dtype).reshape(-1)[:3]
        q, mu_perm, Q = eng._moments(pos, box)
        mu_full = mu_perm.at[self.pspec.sites].add(mu_ind)
        u = eng.energy_with_moments(pos, box, q, mu_full, Q)
        inv_a = (1.0 / self.pspec.alpha.astype(dtype))[:, None]
        u = u + 0.5 * jnp.sum(mu_ind * (inv_a * mu_ind))
        u = u + self._u_pi_patch(pos, box, q, mu_perm, Q, mu_ind)
        u = u + self._u_mut_patch(pos, box, mu_ind)
        return u

    def induced_dipoles(self, pos, box=None):
        """Converged induced dipoles (np, 3), e*A."""
        ps = self.pspec
        pos = jax.lax.stop_gradient(pos)
        box = jax.lax.stop_gradient(jnp.asarray(box, pos.dtype))
        zero = jnp.zeros((ps.sites.shape[0], 3), pos.dtype)
        grad_w = jax.grad(self._w, argnums=2)
        g0 = grad_w(pos, box, zero)
        b = -g0

        def A(m):
            return grad_w(pos, box, m) - g0

        mu0 = ps.alpha[:, None].astype(pos.dtype) * b
        r0 = b - A(mu0)
        p0 = r0

        def body(carry):
            mu, r, p, rs, it = carry
            Ap = A(p)
            denom = jnp.sum(p * Ap)
            a = rs / jnp.where(denom == 0, 1.0, denom)
            mu = mu + a * p
            r = r - a * Ap
            rs_new = jnp.sum(r * r)
            beta = rs_new / jnp.where(rs == 0, 1.0, rs)
            p = r + beta * p
            return mu, r, p, rs_new, it + 1

        def cond(carry):
            _, _, _, rs, it = carry
            return jnp.logical_and(it < ps.cg_iters, rs > ps.cg_tol ** 2)

        mu, *_ = jax.lax.while_loop(
            cond, body, (mu0, r0, p0, jnp.sum(r0 * r0), 0)
        )
        return mu

    def energy_fn(self, pos, box=None):
        """Polarization energy; envelope-exact gradients (the quadratic
        W is evaluated at stop_gradient(mu*), so jax.grad is exact to
        second order in the CG residual)."""
        if box is None:
            raise ValueError("AmoebaPolarizationEwald needs a box")
        mu = jax.lax.stop_gradient(self.induced_dipoles(pos, box))
        zero = jnp.zeros_like(mu)
        e = self._w(pos, box, mu) - self._w(pos, box, zero)
        return ELEC_FACTOR * e

    def calculate(self, pos, box=None):
        """Batched host-protocol fallback (reference forces.py:321-326)."""
        pos = jnp.asarray(pos)
        e, g = jax.vmap(
            jax.value_and_grad(lambda p: self.energy_fn(p, box))
        )(pos)
        return np.asarray(e), -np.asarray(g)


class AmoebaVdw:
    """AMOEBA buffered 14-7 van der Waals (Halgren) as an external term.

    E = eps_ij * (1.07 / (rho + 0.07))^7 * (1.12 / (rho^7 + 0.12) - 2),
    rho = r / rmin_ij, with AMOEBA's combination rules: cubic-mean
    rmin_ij = (r_i^3 + r_j^3) / (r_i^2 + r_j^2) and HHG epsilon
    eps_ij = 4 e_i e_j / (sqrt(e_i) + sqrt(e_j))^2. Hydrogen sites are
    displaced along the H->heavy bond by the `reduction` factor
    (site = heavy + lam * (r_H - r_heavy)), differentiable, so the
    chain-rule force transfer to the heavy atom comes from AD for free.
    Analytic property used as the test pin: the pair energy minimum sits
    exactly at rho = 1 with depth -eps_ij."""

    def __init__(self, ffparams, atom_types, bonds, prm, cutoff=None,
                 switch_dist=None):
        if ffparams.nb_mask is None:
            raise ValueError("AMOEBA vdW needs the dense nonbonded mask")
        atom_types = np.asarray(atom_types).reshape(-1)
        natoms = len(atom_types)
        rec = prm["vdw"]
        atoms = prm.get("atoms", {})
        rmin = np.zeros(natoms)
        eps = np.zeros(natoms)
        lam = np.ones(natoms)
        parent = np.arange(natoms)
        n12 = _neighbor_lists(natoms, bonds)
        for a, t in enumerate(atom_types):
            cls = atoms.get(int(t), {}).get("class", int(t))
            if cls not in rec:
                raise KeyError(
                    f"atom {a}: no vdw record for class {cls} (type {t})"
                )
            r = rec[cls]
            rmin[a] = r["rmin"]
            eps[a] = r["eps"]
            lam[a] = r["reduction"]
            if r["reduction"] != 1.0:
                if len(n12[a]) != 1:
                    raise ValueError(
                        f"atom {a}: vdw reduction needs exactly one bonded "
                        f"heavy neighbour"
                    )
                parent[a] = n12[a][0]
        self.rmin = jnp.asarray(rmin)
        self.eps = jnp.asarray(eps)
        self.lam = jnp.asarray(lam)
        self.parent = jnp.asarray(parent, jnp.int32)
        self.nb_mask = ffparams.nb_mask
        self.cutoff = None if cutoff is None else float(cutoff)
        self.switch_dist = (
            None if switch_dist is None else float(switch_dist)
        )

    def energy_fn(self, pos, box=None):
        dtype = pos.dtype
        lam = self.lam.astype(dtype)[:, None]
        sites = pos[self.parent] + lam * (pos - pos[self.parent])
        dv = wrap_displacement(
            sites[None, :, :] - sites[:, None, :], box
        )
        d2 = jnp.sum(dv * dv, axis=-1)
        n = pos.shape[0]
        mask = self.nb_mask & (
            jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
        )
        if self.cutoff is not None:
            mask = mask & (d2 <= self.cutoff ** 2)
        d2 = jnp.where(mask, d2, 1.0)
        r = jnp.sqrt(d2)
        ri = self.rmin.astype(dtype)
        ei = self.eps.astype(dtype)
        r2s = ri * ri
        rmin_ij = (ri[:, None] ** 3 + ri[None, :] ** 3) / (
            r2s[:, None] + r2s[None, :]
        )
        se = jnp.sqrt(ei)
        eps_ij = 4.0 * ei[:, None] * ei[None, :] / (
            (se[:, None] + se[None, :]) ** 2 + 1e-300
        )
        rho = r / rmin_ij
        rho7 = rho ** 7
        e = eps_ij * (1.07 / (rho + 0.07)) ** 7 * (
            1.12 / (rho7 + 0.12) - 2.0
        )
        if self.switch_dist is not None and self.cutoff is not None:
            from .multipoles import _switch_factor

            e = e * _switch_factor(d2, self.cutoff, self.switch_dist)
        return jnp.sum(jnp.where(mask, e, 0.0))

    def calculate(self, pos, box=None):
        pos = jnp.asarray(pos)
        e, g = jax.vmap(
            jax.value_and_grad(lambda p: self.energy_fn(p, box))
        )(pos)
        return np.asarray(e), -np.asarray(g)


class AmoebaElectrostatics:
    """Permanent multipoles + induced polarization as one external term."""

    def __init__(self, multipoles: Multipoles,
                 polarization: Optional[AmoebaPolarization]):
        self.multipoles = multipoles
        self.polarization = polarization

    def energy_fn(self, pos, box=None):
        e = self.multipoles.energy_fn(pos, box)
        if self.polarization is not None:
            e = e + self.polarization.energy_fn(pos, box)
        return e

    def calculate(self, pos, box=None):
        pos = jnp.asarray(pos)
        e, g = jax.vmap(
            jax.value_and_grad(lambda p: self.energy_fn(p, box))
        )(pos)
        return np.asarray(e), -np.asarray(g)


class AmoebaPotential:
    """Sum of AMOEBA external terms (electrostatics + vdW) behind the
    external-potential protocol."""

    def __init__(self, parts):
        self.parts = parts

    def energy_fn(self, pos, box=None):
        e = self.parts[0].energy_fn(pos, box)
        for p in self.parts[1:]:
            e = e + p.energy_fn(pos, box)
        return e

    def calculate(self, pos, box=None):
        pos = jnp.asarray(pos)
        e, g = jax.vmap(
            jax.value_and_grad(lambda p: self.energy_fn(p, box))
        )(pos)
        return np.asarray(e), -np.asarray(g)


class ChargeCharge:
    """Plain Coulomb over the nonbonded mask. The engine normally owns
    this term (assign the returned monopole charges onto the
    `electrostatics` point-charge term, which rides the Pallas pair
    kernel); this part exists for STANDALONE AmoebaPotential use."""

    def __init__(self, charges, nb_mask, cutoff=None):
        self.q = jnp.asarray(charges)
        self.nb_mask = nb_mask
        self.cutoff = None if cutoff is None else float(cutoff)

    def energy_fn(self, pos, box=None):
        dtype = pos.dtype
        q = self.q.astype(dtype)
        dv = wrap_displacement(pos[None, :, :] - pos[:, None, :], box)
        d2 = jnp.sum(dv * dv, axis=-1)
        n = pos.shape[0]
        mask = self.nb_mask & (
            jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
        )
        if self.cutoff is not None:
            mask = mask & (d2 <= self.cutoff ** 2)
        d2 = jnp.where(mask, d2, 1.0)
        e = ELEC_FACTOR * q[:, None] * q[None, :] * d2 ** -0.5
        return jnp.sum(jnp.where(mask, e, 0.0))


def make_amoeba_potential(ffparams, atom_types, bonds, prm, cutoff=None,
                          switch_dist=None, mutual=True, vdw=True,
                          charge_charge=False, cg_iters=40, cg_tol=1e-6,
                          ewald=False, box=None, ewald_tol=1e-5,
                          pme="auto", pol_ewald=True, valence=False):
    """Full AMOEBA nonbonded stack from parsed .prm data: permanent
    multipoles + Thole mutual polarization + buffered 14-7 vdW, as one
    external-potential object. Returns (AmoebaPotential, charges).

    valence=True additionally folds the .prm's intramolecular terms
    (anharmonic bond/angle, Urey-Bradley, stretch-bend, out-of-plane
    bend, torsion, pi-torsion; `amoeba_valence.AmoebaValence`) into the
    potential, so the returned object is the COMPLETE AMOEBA energy --
    build `Forces` with terms=[] and this as `external` for .prm+.xyz
    MD with no side-channel force field.

    charge_charge=False (default) leaves the monopole Coulomb term to
    the engine: assign the returned charges onto the point-charge
    `electrostatics` term (fast path). True folds it into this object
    for standalone evaluation. ewald=True (periodic production: needs
    `box`) runs the full multipole Ewald sum, monopoles included --
    incompatible with charge_charge and with an engine point-charge
    term."""
    if ewald and charge_charge:
        raise ValueError(
            "ewald=True already includes the monopole Coulomb term"
        )
    elec, charges = make_amoeba_electrostatics(
        ffparams, atom_types, bonds, prm, cutoff=cutoff,
        switch_dist=switch_dist, mutual=mutual, cg_iters=cg_iters,
        cg_tol=cg_tol, ewald=ewald, box=box, ewald_tol=ewald_tol,
        pme=pme, pol_ewald=pol_ewald,
    )
    parts = [elec]
    if charge_charge:
        parts.append(ChargeCharge(charges, ffparams.nb_mask,
                                  cutoff=cutoff))
    if vdw and prm.get("vdw"):
        parts.append(AmoebaVdw(ffparams, atom_types, bonds, prm,
                               cutoff=cutoff, switch_dist=switch_dist))
    if valence:
        from .amoeba_valence import AmoebaValence

        parts.append(AmoebaValence(prm["_text"], atom_types, bonds))
    return AmoebaPotential(parts), charges


def make_amoeba_electrostatics(ffparams, atom_types, bonds, prm,
                               cutoff=None, switch_dist=None,
                               mutual=True, cg_iters=40, cg_tol=1e-6,
                               ewald=False, box=None, ewald_tol=1e-5,
                               pme="auto", pol_ewald=True):
    """One-call AMOEBA electrostatics from parsed .prm data.

    ffparams: FFParams (supplies nb_mask); atom_types: per-atom TINKER
    types; bonds: (nb, 2); prm: output of parse_tinker_prm.
    Returns (AmoebaElectrostatics, charges) -- assign `charges` onto the
    point-charge term (the multipole monopoles replace topology charges).

    ewald=True (needs `box` (3,) and `cutoff`): the permanent-multipole
    term becomes the full Ewald sum (`multipole_ewald.MultipoleEwald`),
    INCLUDING the monopole Coulomb -- do NOT also assign the returned
    charges onto a point-charge term. Induced polarization becomes the
    Ewald-split solver too (`AmoebaPolarizationEwald`: periodic direct
    field + mutual coupling through the same engine, the polarization
    PME tier); pass pol_ewald=False to keep the real-space Thole
    cutoff model instead.

    pme: reciprocal-sum engine under ewald=True. "auto" (default) picks
    the gridded multipole PME (`multipole_ewald.MultipolePme`,
    O(N p^3 + K^3 log K)) when natoms >= TMD_MULTIPOLE_PME_N (env,
    default 256) and the exact structure-factor sum below it; True /
    False force the choice.
    """
    mp, charges = make_amoeba_multipoles(
        ffparams, atom_types, bonds, prm["multipoles"],
        cutoff=None if ewald else cutoff,
        switch_dist=None if ewald else switch_dist,
    )
    pol = None
    if mutual and prm["polarize"]:
        atom_types = np.asarray(atom_types).reshape(-1)
        rec = prm["polarize"]
        sites, alpha, thole = [], [], []
        for a, t in enumerate(atom_types):
            if int(t) in rec:
                sites.append(a)
                alpha.append(rec[int(t)]["alpha"])
                thole.append(rec[int(t)]["thole"])
        if sites:
            groups = polarization_groups(atom_types, bonds, rec)
            gs = groups[np.asarray(sites)]
            perm_mask = gs[:, None] != gs[None, :]
            pspec = PolarizationSpec(
                sites=jnp.asarray(sites, jnp.int32),
                alpha=jnp.asarray(alpha),
                thole=jnp.asarray(thole),
                perm_mask=jnp.asarray(perm_mask),
                cutoff=None if cutoff is None else float(cutoff),
                cg_iters=int(cg_iters),
                cg_tol=float(cg_tol),
            )
            pol = AmoebaPolarization(mp.spec, jnp.asarray(charges), pspec)
    perm = mp
    if ewald:
        if box is None or cutoff is None:
            raise ValueError("ewald=True needs box=(3,) and a cutoff")
        from .multipole_ewald import MultipoleEwald, MultipolePme

        natoms = int(np.asarray(atom_types).reshape(-1).shape[0])
        use_pme = (
            pme if isinstance(pme, bool)
            else natoms >= int(os.environ.get("TMD_MULTIPOLE_PME_N",
                                              "256"))
        )
        cls = MultipolePme if use_pme else MultipoleEwald
        perm = cls(mp.spec, jnp.asarray(charges),
                   np.asarray(box), cutoff, tol=ewald_tol)
        if pol is not None and pol_ewald:
            pol = AmoebaPolarizationEwald(perm, pol.pspec)
    return AmoebaElectrostatics(perm, pol), charges
