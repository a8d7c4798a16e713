"""`kat plot density` — heatmap of a .mx matrix with contours.

Behavioral re-implementation of reference scripts/kat/plot/density.py:
identical axis-limit heuristics (99.5%-volume cutoff skipping the y scan for
GC matrices, density.py:114-145) and viridis pcolormesh + white contours.
"""

from __future__ import annotations

import argparse

import numpy as np
import scipy.ndimage as ndimage

from .misc import correct_filename, findpeaks, readheader, wrap


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Create K-mer Density Plots.")
    parser.add_argument("matrix_file")
    parser.add_argument("-o", "--output", default="kat-density")
    parser.add_argument("-p", "--output_type")
    parser.add_argument("-t", "--title")
    parser.add_argument("-a", "--x_label")
    parser.add_argument("-b", "--y_label")
    parser.add_argument("-c", "--z_label")
    parser.add_argument("-x", "--x_max", type=int)
    parser.add_argument("-y", "--y_max", type=int)
    parser.add_argument("-z", "--z_max", type=int)
    parser.add_argument("-w", "--width", type=int, default=8)
    parser.add_argument("-l", "--height", type=int, default=6)
    parser.add_argument("--contours", choices=["none", "normal", "smooth"],
                        default="normal")
    parser.add_argument("--not_rasterised", dest="rasterised",
                        action="store_false", default=True)
    parser.add_argument("--dpi", type=int, default=300)
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    import matplotlib.pyplot as plt

    with open(args.matrix_file) as f:
        header = readheader(f)
        matrix = np.loadtxt(f)
    if header.get("Transpose") == "1":
        matrix = np.transpose(matrix)

    title = args.title or header.get("Title", "Density Plot")
    x_label = args.x_label or header.get("XLabel", "X")
    y_label = args.y_label or header.get("YLabel", "Y")
    z_label = args.z_label or header.get("ZLabel", "Z")

    if args.contours == "smooth":
        matrix_smooth = ndimage.gaussian_filter(matrix, sigma=2.0, order=0)

    if args.x_max is None or args.y_max is None or args.z_max is None:
        msum = np.sum(matrix)
        xsums = np.sum(matrix, 0)
        ysums = np.sum(matrix, 1)
        peakx = findpeaks(xsums)
        peaky = findpeaks(ysums)
        peakx = peakx[peakx != 1]
        peaky = peaky[peaky != 1]
        peakz = matrix[peaky, :][:, peakx]

        xmax = len(xsums)
        ymax = len(ysums)
        for i in range(1, len(xsums), int(len(xsums) / 40) + 1):
            if np.sum(xsums[:i]) >= msum * 0.995:
                xmax = i
                break
        if y_label != "GC count":
            for i in range(1, len(ysums), int(len(ysums) / 40) + 1):
                if np.sum(ysums[:i]) >= msum * 0.995:
                    ymax = i
                    break
        zmax = np.max(peakz) * 1.1 if peakz.size else 25

    if args.x_max is not None:
        xmax = args.x_max
    if args.y_max is not None:
        ymax = args.y_max
    if args.z_max is not None:
        zmax = args.z_max
    xmax = max(xmax, 25)
    ymax = max(ymax, 25)
    zmax = max(zmax, 25)

    plt.figure(num=None, figsize=(args.width, args.height))
    plt.pcolormesh(matrix, vmin=0, vmax=zmax, cmap="viridis",
                   rasterized=args.rasterised)
    plt.axis([0, xmax, 0, ymax])
    cbar = plt.colorbar()
    cbar.set_label(wrap(z_label))
    cbar.solids.set_rasterized(args.rasterised)
    if zmax > 0:
        levels = np.arange(zmax / 8, zmax, zmax / 8)
        if args.contours == "normal":
            plt.contour(matrix, colors="white", alpha=0.6, levels=levels)
        elif args.contours == "smooth":
            plt.contour(matrix_smooth, colors="white", alpha=0.6,
                        levels=levels)
    plt.title(wrap(title))
    plt.xlabel(wrap(x_label))
    plt.ylabel(wrap(y_label))
    plt.grid(True, color="white", alpha=0.2)
    plt.tight_layout()

    out = (args.output + "." + args.output_type if args.output_type
           else args.output)
    plt.savefig(correct_filename(out), dpi=args.dpi)
    plt.close()
    return 0


if __name__ == "__main__":
    main()
