"""YAML force-field reader.

Implements the same custom YAML schema and wildcard-matching semantics as
the reference (torchmd/forcefields/ff_yaml.py:7-103): sections `atomtypes`,
`masses`, `bonds`, `angles`, `dihedrals` (with `terms`, `scnb`, `scee`),
`impropers`, `lj` (sigma/epsilon + sigma14/epsilon14), `electrostatics`.
Atom-type keys may use `X` wildcards; matches are tried fewest-wildcards
first, with reversed tuples for bonds/angles/dihedrals and center-fixed
permutations for impropers (center at position 2).
"""

from __future__ import annotations

from math import radians

import numpy as np
import yaml

from .forcefield import _ForceFieldBase


class YamlForcefield(_ForceFieldBase):
    def __init__(self, mol, prm):
        self.mol = mol
        if isinstance(prm, str):
            with open(prm, "r") as f:
                self.prm = yaml.safe_load(f)
        else:
            self.prm = dict(prm)  # already-parsed dict

    def _get_x_variants(self, atomtypes):
        from itertools import product

        permutations = np.array(
            sorted(product([False, True], repeat=len(atomtypes)), key=sum)
        )
        variants = []
        for per in permutations:
            tmpat = atomtypes.copy()
            tmpat[per] = "X"
            variants.append(tmpat)
        return variants

    def get_parameters(self, term, atomtypes):
        from itertools import permutations

        atomtypes = np.array(atomtypes)
        variants = self._get_x_variants(atomtypes)
        if term in ("bonds", "angles", "dihedrals"):
            variants += self._get_x_variants(atomtypes[::-1])
        elif term == "impropers":
            perms = np.array(
                [x for x in permutations((0, 1, 2, 3)) if x[2] == 2]
            )
            for perm in perms:
                variants += self._get_x_variants(atomtypes[perm])
        variants = sorted(variants, key=lambda x: np.sum(x == "X"))

        termpar = self.prm[term]
        for var in variants:
            key = ", ".join(var)
            if len(var) > 1:
                key = "(" + key + ")"
            if key in termpar:
                return termpar[key]
        raise RuntimeError(f"{atomtypes} doesn't have {term} information in the FF")

    def get_atom_types(self):
        return np.unique(self.prm["atomtypes"])

    def get_charge(self, at):
        return self.get_parameters("electrostatics", [at])["charge"]

    def get_mass(self, at):
        return self.prm["masses"][at]

    def get_LJ(self, at):
        p = self.get_parameters("lj", [at])
        return p["sigma"], p["epsilon"]

    def get_bond(self, at1, at2):
        p = self.get_parameters("bonds", [at1, at2])
        return p["k0"], p["req"]

    def get_angle(self, at1, at2, at3):
        p = self.get_parameters("angles", [at1, at2, at3])
        return p["k0"], radians(p["theta0"])

    def get_dihedral(self, at1, at2, at3, at4):
        p = self.get_parameters("dihedrals", [at1, at2, at3, at4])
        return [[t["phi_k"], radians(t["phase"]), t["per"]] for t in p["terms"]]

    def get_14(self, at1, at2, at3, at4):
        p = self.get_parameters("dihedrals", [at1, at2, at3, at4])
        lj1 = self.get_parameters("lj", [at1])
        lj4 = self.get_parameters("lj", [at4])
        return (
            p.get("scnb", 1),
            p.get("scee", 1),
            lj1["sigma14"],
            lj1["epsilon14"],
            lj4["sigma14"],
            lj4["epsilon14"],
        )

    def get_improper(self, at1, at2, at3, at4):
        p = self.get_parameters("impropers", [at1, at2, at3, at4])
        return p["phi_k"], radians(p["phase"]), p["per"]
