"""AMOEBA valence (bonded) terms from TINKER .prm files.

Completes the AMOEBA file story: `amoeba.py` covers the nonbonded half
(multipoles + polarization + buffered 14-7), this module parses and
evaluates the intramolecular terms so a TINKER .prm + .xyz pair drives
COMPLETE MD with no side-channel force field. The reference has no
AMOEBA support of any kind (fixed harmonic bonds/angles only,
torchmd/forces.py:14-18); capability beyond it.

Functional forms (TINKER energy routines ebond/eangle/eurey/eopbend/
estrbnd/etors/epitors; Ponder & Case, Adv. Protein Chem. 66:27, 2003):

  bond     E = bu * K dr^2 (1 + c3 dr + c4 dr^2), dr = r - r0 (A);
           AMOEBA headers set c3 = -2.55, c4 = 3.793125.
  angle    E = au * K dt^2 (1 + c3 dt + c4 dt^2 + c5 dt^3 + c6 dt^4),
           dt = theta - theta0 in DEGREES (the published cubic..sextic
           constants are per-degree powers); au defaults to
           (pi/180)^2 so K is effectively kcal/mol/rad^2. TINKER's
           in-plane 'anglep' records are evaluated with the same
           expansion about the regular bond angle (documented
           approximation).
  ureybrad E = uu * K dr^2 (1 + uc3 dr + uc4 dr^2) on the 1-3 distance.
  opbend   E = ou * K chi^2 (1 + oc3 chi + ...), chi the Wilson-Decius-
           Cross out-of-plane angle (degrees) of the a-b bond at
           trigonal center b with remaining attached atoms c, d.
  strbnd   E = su * (K1 dr_ab + K2 dr_cb) * dt, dt in degrees,
           su defaulting to pi/180 (TINKER's STBNUNIT).
  torsion  E = tu * sum_n (V_n / 2)(1 + cos(n phi - gamma_n)); AMOEBA
           headers set tu = 0.5.
  pitors   E = pu * K (1 + cos(2 phi - pi)) over the pi-orbital
           torsion of a double bond between trigonal centers.

Angle/torsion instances derive from the .xyz bond graph; parameters
resolve by atom CLASS (via the prm's atom records) with forward/reverse
key matching and 0-wildcards in torsions. TINKER's multi-theta0 angle
records (extra columns for 0/1/2 additional hydrogens on the central
atom) select by counting H atoms (mass < 3.5) bonded to the center
outside the angle.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_DEG = math.pi / 180.0

# header keyword -> (dict key, default)
_SCALE_KEYS = {
    "bondunit": ("bond_unit", 1.0),
    "bond-cubic": ("bond_cubic", 0.0),
    "bond-quartic": ("bond_quartic", 0.0),
    "angleunit": ("angle_unit", _DEG * _DEG),
    "angle-cubic": ("angle_cubic", 0.0),
    "angle-quartic": ("angle_quartic", 0.0),
    "angle-pentic": ("angle_pentic", 0.0),
    "angle-sextic": ("angle_sextic", 0.0),
    "ureyunit": ("urey_unit", 1.0),
    "urey-cubic": ("urey_cubic", 0.0),
    "urey-quartic": ("urey_quartic", 0.0),
    "opbendunit": ("opbend_unit", _DEG * _DEG),
    "opbend-cubic": ("opbend_cubic", 0.0),
    "opbend-quartic": ("opbend_quartic", 0.0),
    "opbend-pentic": ("opbend_pentic", 0.0),
    "opbend-sextic": ("opbend_sextic", 0.0),
    "torsionunit": ("torsion_unit", 1.0),
    "strbndunit": ("strbnd_unit", _DEG),
    "pitorsunit": ("pitors_unit", 1.0),
    "tortorunit": ("tortor_unit", 1.0),
}


def parse_tinker_valence(text):
    """Parse bond/angle/anglep/ureybrad/opbend/strbnd/torsion/pitors
    records + the header unit/anharmonicity keywords. Returns a dict of
    class-keyed tables (see module docstring for the energy forms)."""
    out = {
        "scales": {k: v for k, v in _SCALE_KEYS.values()},
        "bond": {}, "angle": {}, "ureybrad": {}, "opbend": {},
        "strbnd": {}, "torsion": {}, "pitors": {}, "tortors": {},
    }
    tt_pending = None      # (classes, points-still-expected, triplets)
    for raw in text.splitlines():
        ln = raw.split("#")[0].strip()
        if not ln:
            continue
        parts = ln.split()
        if tt_pending is not None:
            cls5, left, trips = tt_pending
            if len(parts) == 3 and all(_is_float(p) for p in parts):
                trips.append(tuple(float(p) for p in parts))
                left -= 1
                tt_pending = None if left == 0 else (cls5, left, trips)
                if left == 0:
                    out["tortors"][cls5] = _tortors_grid(trips)
                continue
            raise ValueError(
                f"tortors {cls5}: expected {left} more grid lines"
            )
        key = parts[0].lower()
        if key in _SCALE_KEYS:
            name, _ = _SCALE_KEYS[key]
            out["scales"][name] = float(parts[1])
        elif key == "bond":
            a, b = int(parts[1]), int(parts[2])
            out["bond"][_k2(a, b)] = (float(parts[3]), float(parts[4]))
        elif key in ("angle", "anglep"):
            a, b, c = (int(p) for p in parts[1:4])
            k = float(parts[4])
            th = [float(p) for p in parts[5:8]]
            out["angle"][_k3(a, b, c)] = (k, th)
        elif key == "ureybrad":
            a, b, c = (int(p) for p in parts[1:4])
            out["ureybrad"][_k3(a, b, c)] = (
                float(parts[4]), float(parts[5])
            )
        elif key == "opbend":
            a, b, c, d = (int(p) for p in parts[1:5])
            cd = tuple(sorted((c, d)))
            out["opbend"][(a, b) + cd] = float(parts[5])
        elif key == "strbnd":
            a, b, c = (int(p) for p in parts[1:4])
            k1, k2 = float(parts[4]), float(parts[5])
            # store oriented: K1 couples the a-b bond, K2 the c-b bond
            out["strbnd"][(a, b, c)] = (k1, k2)
            out["strbnd"].setdefault((c, b, a), (k2, k1))
        elif key == "torsion":
            cls = tuple(int(p) for p in parts[1:5])
            terms = []
            vals = parts[5:]
            for i in range(0, len(vals) - 2, 3):
                terms.append((float(vals[i]), float(vals[i + 1]),
                              int(float(vals[i + 2]))))
            out["torsion"][cls] = terms
        elif key == "pitors":
            a, b = int(parts[1]), int(parts[2])
            out["pitors"][_k2(a, b)] = float(parts[3])
        elif key == "tortors":
            cls5 = tuple(int(p) for p in parts[1:6])
            nx, ny = int(parts[6]), int(parts[7])
            tt_pending = (cls5, nx * ny, [])
    return out


def _tortors_grid(trips):
    """(angle1, angle2, value) triplets -> periodic (n, n) grid with
    grid[i, j] at angles (-180 + i*h, -180 + j*h). TINKER lists both
    -180 and +180 edges; the duplicate wrap row/column is dropped so
    the CMAP periodic-spline machinery applies directly."""
    trips = np.asarray(trips, np.float64)
    a1 = np.unique(trips[:, 0])
    a2 = np.unique(trips[:, 1])
    h1 = a1[1] - a1[0]
    h2 = a2[1] - a2[0]
    n1 = int(round(360.0 / h1))
    n2 = int(round(360.0 / h2))
    if n1 != n2:
        raise ValueError("tortors grids must be square in resolution")
    grid = np.zeros((n1, n1))
    for x, y, v in trips:
        i = int(round((x + 180.0) / h1)) % n1
        j = int(round((y + 180.0) / h2)) % n2
        grid[i, j] = v
    return grid


def _is_float(s):
    try:
        float(s)
        return True
    except ValueError:
        return False


def _k2(a, b):
    return (a, b) if a <= b else (b, a)


def _k3(a, b, c):
    return (a, b, c) if a <= c else (c, b, a)


def derive_valence_instances(natoms, bonds):
    """Angles (i, j, k) and proper torsions (i, j, k, l) from the bond
    graph, each unordered path listed once."""
    n12 = [[] for _ in range(natoms)]
    for a, b in np.asarray(bonds).reshape(-1, 2):
        n12[int(a)].append(int(b))
        n12[int(b)].append(int(a))
    angles = []
    for j in range(natoms):
        nb = sorted(n12[j])
        for x in range(len(nb)):
            for y in range(x + 1, len(nb)):
                angles.append((nb[x], j, nb[y]))
    seen = set()
    torsions = []
    for a, b in np.asarray(bonds).reshape(-1, 2):
        j, k = int(a), int(b)
        for i in n12[j]:
            if i == k:
                continue
            for l in n12[k]:
                if l == j or l == i:
                    continue
                t = (i, j, k, l)
                if t[::-1] in seen:
                    continue
                seen.add(t)
                torsions.append(t)
    return angles, torsions, n12


def _match_torsion(table, c):
    """Torsion class lookup with TINKER 0-wildcards, most-specific
    first (exact, one-ended wildcard, double wildcard), both
    directions."""
    cands = [
        c, c[::-1],
        (0, c[1], c[2], c[3]), (c[3], c[2], c[1], 0),
        (c[0], c[1], c[2], 0), (0, c[2], c[1], c[0]),
        (0, c[1], c[2], 0), (0, c[2], c[1], 0),
    ]
    for key in cands:
        if key in table:
            return table[key]
    return None


class AmoebaValence:
    """All AMOEBA intramolecular terms as one external-potential object
    (`energy_fn(pos, box)`; box is ignored -- valence terms never span
    a periodic image in a wrapped molecule convention)."""

    def __init__(self, prm, atom_types, bonds, masses=None):
        if isinstance(prm, str):
            val = parse_tinker_valence(prm)
            from .amoeba import parse_tinker_prm

            atoms = parse_tinker_prm(prm)["atoms"]
        else:
            val, atoms = prm
        self.scales = val["scales"]
        atom_types = np.asarray(atom_types).reshape(-1)
        natoms = len(atom_types)
        cls = np.asarray([
            atoms.get(int(t), {}).get("class", int(t))
            for t in atom_types
        ])
        if masses is None:
            masses = np.asarray([
                atoms.get(int(t), {}).get("mass", 0.0)
                for t in atom_types
            ])
        masses = np.asarray(masses, np.float64).reshape(-1)
        is_h = masses < 3.5
        bonds = np.asarray(bonds).reshape(-1, 2)
        angles, torsions, n12 = derive_valence_instances(natoms, bonds)

        # ---- bonds ----
        b_idx, b_prm = [], []
        for a, b in bonds:
            rec = val["bond"].get(_k2(int(cls[a]), int(cls[b])))
            if rec is not None:
                b_idx.append((a, b))
                b_prm.append(rec)
        self._bonds = _table(b_idx, b_prm)

        # ---- angles (+ urey + strbnd riding the same instances) ----
        a_idx, a_prm = [], []
        u_idx, u_prm = [], []
        s_idx, s_prm = [], []
        for (i, j, k) in angles:
            ci, cj, ck = int(cls[i]), int(cls[j]), int(cls[k])
            rec = val["angle"].get((ci, cj, ck)) or \
                val["angle"].get((ck, cj, ci))
            if rec is not None:
                kf, th_list = rec
                # multi-theta0: pick by H count on j outside the angle
                nh = sum(
                    1 for x in n12[j] if x not in (i, k) and is_h[x]
                )
                th0 = th_list[min(nh, len(th_list) - 1)]
                a_idx.append((i, j, k))
                a_prm.append((kf, th0))
            u = val["ureybrad"].get((ci, cj, ck)) or \
                val["ureybrad"].get((ck, cj, ci))
            if u is not None:
                u_idx.append((i, k))
                u_prm.append(u)
            s = val["strbnd"].get((ci, cj, ck))
            s_rev = val["strbnd"].get((ck, cj, ci))
            if s is None and s_rev is not None:
                s = (s_rev[1], s_rev[0])
            if s is not None and rec is not None:
                rb1 = val["bond"].get(_k2(ci, cj))
                rb2 = val["bond"].get(_k2(ck, cj))
                if rb1 is not None and rb2 is not None:
                    th0 = a_prm[-1][1]
                    s_idx.append((i, j, k))
                    s_prm.append((s[0], s[1], rb1[1], rb2[1], th0))
        self._angles = _table(a_idx, a_prm)
        self._ureys = _table(u_idx, u_prm)
        self._strbnd = _table(s_idx, s_prm)

        # ---- out-of-plane bends at trigonal centers ----
        o_idx, o_prm = [], []
        for j in range(natoms):
            if len(n12[j]) != 3:
                continue
            nb = n12[j]
            for a in nb:
                rest = tuple(sorted(int(cls[x]) for x in nb if x != a))
                for key in [
                    (int(cls[a]), int(cls[j])) + rest,
                    (int(cls[a]), int(cls[j]), 0, 0),
                ]:
                    if key in val["opbend"]:
                        others = [x for x in nb if x != a]
                        o_idx.append((a, j, others[0], others[1]))
                        o_prm.append((val["opbend"][key],))
                        break
        self._opbend = _table(o_idx, o_prm)

        # ---- torsions ----
        t_idx, t_prm = [], []
        for (i, j, k, l) in torsions:
            terms = _match_torsion(
                val["torsion"],
                (int(cls[i]), int(cls[j]), int(cls[k]), int(cls[l])),
            )
            if terms:
                for (amp, phase, per) in terms:
                    if amp != 0.0:
                        t_idx.append((i, j, k, l))
                        t_prm.append((amp, phase * _DEG, float(per)))
        self._torsions = _table(t_idx, t_prm)

        # ---- torsion-torsion coupling: tortors grids ride the CMAP
        # bicubic machinery (cmap.py) -- 5-atom chains, two overlapping
        # dihedrals, one periodic spline surface per class key ----
        tt_idx, tt_type, tt_grids = [], [], []
        if val["tortors"]:
            seen_ch = set()
            grid_slot = {}          # class key -> coeff-table row
            for t in torsions:
                for tt in (t, t[::-1]):
                    for mdl in n12[tt[3]]:
                        if mdl in tt:
                            continue
                        ch = tt + (mdl,)
                        if ch in seen_ch or ch[::-1] in seen_ch:
                            continue
                        seen_ch.add(ch)
                        c5 = tuple(int(cls[x]) for x in ch)
                        grid = val["tortors"].get(c5)
                        if grid is None:
                            g_r = val["tortors"].get(c5[::-1])
                            # reversed match swaps the two dihedrals
                            grid = None if g_r is None else g_r.T
                        if grid is None:
                            continue
                        if c5 not in grid_slot:
                            grid_slot[c5] = len(tt_grids)
                            tt_grids.append(grid)
                        tt_idx.append(ch[:4] + ch[1:])
                        tt_type.append(grid_slot[c5])
        if tt_idx:
            from .cmap import CMapTable, build_cmap_coeff_table

            self._tortors = CMapTable(
                idx=jnp.asarray(np.asarray(tt_idx, np.int32)),
                type=jnp.asarray(np.asarray(tt_type, np.int32)),
                coeffs=jnp.asarray(build_cmap_coeff_table(tt_grids)),
            )
        else:
            self._tortors = None

        # ---- pi-torsions: bonded trigonal-trigonal pairs ----
        p_idx, p_prm = [], []
        for a, b in bonds:
            a, b = int(a), int(b)
            if len(n12[a]) != 3 or len(n12[b]) != 3:
                continue
            rec = val["pitors"].get(_k2(int(cls[a]), int(cls[b])))
            if rec is None:
                continue
            ra = [x for x in n12[a] if x != b]
            rb = [x for x in n12[b] if x != a]
            p_idx.append((ra[0], ra[1], a, b, rb[0], rb[1]))
            p_prm.append((rec,))
        self._pitors = _table(p_idx, p_prm)

    # ------------------------------------------------------------------
    def energy_fn(self, pos, box=None):
        s = self.scales
        dtype = pos.dtype
        e = jnp.zeros((), dtype)

        if self._bonds is not None:
            idx, prm = self._bonds
            dr = _dist(pos, idx[:, 0], idx[:, 1]) - prm[:, 1]
            e = e + s["bond_unit"] * jnp.sum(
                prm[:, 0] * dr * dr
                * (1.0 + s["bond_cubic"] * dr + s["bond_quartic"] * dr * dr)
            )

        if self._angles is not None:
            idx, prm = self._angles
            th = _angle_deg(pos, idx)
            dt = th - prm[:, 1]
            poly = (1.0 + dt * (s["angle_cubic"] + dt * (
                s["angle_quartic"] + dt * (
                    s["angle_pentic"] + dt * s["angle_sextic"]))))
            e = e + s["angle_unit"] * jnp.sum(prm[:, 0] * dt * dt * poly)

        if self._ureys is not None:
            idx, prm = self._ureys
            dr = _dist(pos, idx[:, 0], idx[:, 1]) - prm[:, 1]
            e = e + s["urey_unit"] * jnp.sum(
                prm[:, 0] * dr * dr
                * (1.0 + s["urey_cubic"] * dr + s["urey_quartic"] * dr * dr)
            )

        if self._strbnd is not None:
            idx, prm = self._strbnd
            dt = _angle_deg(pos, idx) - prm[:, 4]
            dr1 = _dist(pos, idx[:, 0], idx[:, 1]) - prm[:, 2]
            dr2 = _dist(pos, idx[:, 2], idx[:, 1]) - prm[:, 3]
            e = e + s["strbnd_unit"] * jnp.sum(
                (prm[:, 0] * dr1 + prm[:, 1] * dr2) * dt
            )

        if self._opbend is not None:
            idx, prm = self._opbend
            chi = _opbend_deg(pos, idx)
            poly = (1.0 + chi * (s["opbend_cubic"] + chi * (
                s["opbend_quartic"] + chi * (
                    s["opbend_pentic"] + chi * s["opbend_sextic"]))))
            e = e + s["opbend_unit"] * jnp.sum(
                prm[:, 0] * chi * chi * poly
            )

        if self._torsions is not None:
            idx, prm = self._torsions
            phi = _dihedral(pos, idx)
            e = e + s["torsion_unit"] * jnp.sum(
                0.5 * prm[:, 0]
                * (1.0 + jnp.cos(prm[:, 2] * phi - prm[:, 1]))
            )

        if self._pitors is not None:
            idx, prm = self._pitors
            phi = _pitors_angle(pos, idx)
            e = e + s["pitors_unit"] * jnp.sum(
                prm[:, 0] * (1.0 + jnp.cos(2.0 * phi - jnp.pi))
            )

        if self._tortors is not None:
            # same bicubic surface as cmap.cmap_energy, but the angles
            # come from THIS module's IUPAC-sign dihedral (TINKER's
            # convention; potentials._dihedral_phi is its negative)
            tab = self._tortors
            n = tab.coeffs.shape[1]
            hcell = 2.0 * jnp.pi / n
            phi = _dihedral(pos, tab.idx[:, 0:4])
            psi = _dihedral(pos, tab.idx[:, 4:8])

            def locate(ang):
                x = (ang + jnp.pi) / hcell
                cell = jnp.floor(x)
                return (jnp.mod(cell.astype(jnp.int32), n), x - cell)

            ci, t = locate(phi)
            cj, u = locate(psi)
            a = tab.coeffs[tab.type, ci, cj]
            one = jnp.ones_like(t)
            tp = jnp.stack([one, t, t * t, t * t * t], axis=-1)
            up = jnp.stack([one, u, u * u, u * u * u], axis=-1)
            e = e + s["tortor_unit"] * jnp.sum(
                jnp.einsum("cp,cpq,cq->c", tp, a, up)
            )
        return e

    def calculate(self, pos, box=None):
        pos = jnp.asarray(pos)
        e, g = jax.vmap(
            jax.value_and_grad(lambda p: self.energy_fn(p, box))
        )(pos)
        return np.asarray(e), -np.asarray(g)


def _table(idx, prm):
    if not idx:
        return None
    return (jnp.asarray(np.asarray(idx, np.int32)),
            jnp.asarray(np.asarray(prm, np.float64)))


def _dist(pos, i, j):
    d = pos[i] - pos[j]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def _angle_deg(pos, idx):
    u = pos[idx[:, 0]] - pos[idx[:, 1]]
    v = pos[idx[:, 2]] - pos[idx[:, 1]]
    cross = jnp.linalg.norm(jnp.cross(u, v), axis=-1)
    dot = jnp.sum(u * v, axis=-1)
    return jnp.arctan2(cross, dot) / _DEG


def _dihedral(pos, idx):
    b1 = pos[idx[:, 1]] - pos[idx[:, 0]]
    b2 = pos[idx[:, 2]] - pos[idx[:, 1]]
    b3 = pos[idx[:, 3]] - pos[idx[:, 2]]
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(y, x)


def _opbend_deg(pos, idx):
    """Wilson-Decius-Cross out-of-plane angle (degrees): the angle
    between the b->a bond and the c-b-d plane, for rows (a, b, c, d)."""
    a = pos[idx[:, 0]] - pos[idx[:, 1]]
    c = pos[idx[:, 2]] - pos[idx[:, 1]]
    d = pos[idx[:, 3]] - pos[idx[:, 1]]
    n = jnp.cross(c, d)
    nn = jnp.linalg.norm(n, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    sin_chi = jnp.sum(n * a, axis=-1) / jnp.where(
        nn * na > 0, nn * na, 1.0
    )
    sin_chi = jnp.clip(sin_chi, -1.0, 1.0)
    return jnp.abs(jnp.arcsin(sin_chi)) / _DEG


def _pitors_angle(pos, idx):
    """Pi-orbital torsion (TINKER epitors): for rows
    (a1, a2, b, c, c1, c2) with the b=c double bond, the dihedral of
    the projected pi-orbital axes."""
    b, c = pos[idx[:, 2]], pos[idx[:, 3]]
    # orbital normals at each center
    nb = jnp.cross(pos[idx[:, 0]] - b, pos[idx[:, 1]] - b)
    nc = jnp.cross(pos[idx[:, 4]] - c, pos[idx[:, 5]] - c)
    axis = c - b
    # dihedral of nb-tip .. b .. c .. nc-tip about the bond axis
    b1 = -nb
    b2 = axis
    b3 = nc
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(y, x)


def make_amoeba_valence(prm_text, atom_types, bonds, masses=None):
    """One-call valence potential from a TINKER .prm text."""
    return AmoebaValence(prm_text, atom_types, bonds, masses=masses)
