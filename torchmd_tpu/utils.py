"""Logging, config and trajectory-conversion utilities.

Functional equivalents of the reference helpers (torchmd/utils.py):
CSV monitor writer with wall-time column, YAML/k=v config merging for
argparse, resolved-config persistence, and npy->xyz conversion.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time

import numpy as np
import yaml


class LogWriter:
    """CSV monitor (one row per output period, flushed immediately, with a
    wall-time column `t`), mirroring torchmd/utils.py:10-38."""

    def __init__(self, path, keys, header="", name="monitor.csv"):
        self.keys = tuple(keys) + ("t",)
        assert path is not None
        os.makedirs(path, exist_ok=True)
        filename = os.path.join(path, name)
        if os.path.exists(filename):
            os.remove(filename)
        self.f = open(filename, "wt")
        if isinstance(header, dict):
            header = "# {} \n".format(json.dumps(header))
        self.f.write(header)
        self.logger = csv.DictWriter(self.f, fieldnames=self.keys)
        self.logger.writeheader()
        self.f.flush()
        self.tstart = time.time()

    def write_row(self, epinfo):
        if self.logger:
            epinfo = dict(epinfo)
            epinfo["t"] = time.time() - self.tstart
            self.logger.writerow(epinfo)
            self.f.flush()

    def close(self):
        self.f.close()


class LoadFromFile(argparse.Action):
    """argparse action merging a YAML (or k=v) config file into the
    namespace (torchmd/utils.py:41-57)."""

    def __call__(self, parser, namespace, values, option_string=None):
        if values.name.endswith("yaml") or values.name.endswith("yml"):
            with values as f:
                namespace.__dict__.update(yaml.safe_load(f))
            return
        with values as f:
            for line in f.read().rstrip().split("\n"):
                k, v = line.split("=")
                typ = type(namespace.__dict__[k])
                namespace.__dict__[k] = typ(v) if typ is not None else v


def save_argparse(args, filename, exclude=None):
    if filename.endswith("yaml") or filename.endswith("yml"):
        if isinstance(exclude, str):
            exclude = [exclude]
        d = args.__dict__.copy()
        for exl in exclude or []:
            d.pop(exl, None)
        with open(filename, "w") as fout:
            yaml.dump(d, fout)
    else:
        with open(filename, "w") as f:
            for k, v in args.__dict__.items():
                if k is exclude:
                    continue
                f.write(f"{k}={v}\n")


def xyz_writer(input_file, output_file, mol_elements):
    """Convert an (natoms, 3, nsteps) .npy trajectory to .xyz
    (torchmd/utils.py:78-93)."""
    npy_traj = np.load(input_file)
    nats, _, nsteps = npy_traj.shape
    with open(output_file, "a") as f:
        for i in range(nsteps):
            f.write(f"{nats}\n\n")
            for j in range(nats):
                f.write(f"{mol_elements[j]} ")
                f.write(" ".join(map(str, npy_traj[j, :, i])))
                f.write("\n")
