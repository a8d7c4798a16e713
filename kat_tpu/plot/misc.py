"""Shared plotting helpers (reference scripts/kat/plot/misc.py): mme header
reading, peak finding, filename extension correction, label wrapping."""

from __future__ import annotations

import textwrap

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def readheader(input_file) -> dict:
    """Parse `# Key:value` lines until `###` (misc.py:7-19).  Leaves the
    file positioned at the first data line."""
    header = {}
    for line in input_file:
        if line[0:2] == "# ":
            s = line[2:-1].split(":")
            header[s[0]] = ":".join(s[1:])
        elif line[:-1] == "###":
            break
        else:
            break
    return header


def findpeaks(a) -> np.ndarray:
    """Indices of local maxima, plateau-end aware (misc.py:21-26)."""
    a = np.squeeze(np.asarray(a))
    ad = np.sign(np.diff(a))
    ad[ad == 0] = 1
    return np.where(np.diff(ad) == -2)[0] + 1


def correct_filename(filename: str) -> str:
    split = filename.split(".")
    ext = split[-1] if len(split) > 1 else ""
    types = list(plt.gcf().canvas.get_supported_filetypes().keys())
    if ext in types:
        return filename
    if "png" in types:
        return filename + ".png"
    if "pdf" in types:
        return filename + ".pdf"
    return filename + "." + types[0]


def wrap(name: str) -> str:
    return "\n".join(textwrap.wrap(name, 60))
