#!/usr/bin/env python
"""Compare two folders of corresponding images and emit per-pair + mean
metrics (text or LaTeX table).

CLI parity with reference scripts/compare_image_pairs.py:39-99.
"""

import os
import sys

# Allow running straight from a checkout: scripts/ is on sys.path, the
# package root is not.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
from os.path import join as pjoin

import imageio.v3 as iio
import numpy as np

from hive_tpu.metrics import lpips, metric_skip_notes, mifd, psnr, ssim


def compare_folders(folder_a: str, folder_b: str) -> dict:
    filenames_a = sorted(os.listdir(folder_a))
    filenames_b = sorted(os.listdir(folder_b))

    if len(filenames_a) != len(filenames_b):
        raise RuntimeError(f"Folders contain different image counts: "
                           f"{len(filenames_a)} vs {len(filenames_b)}")

    rows = []

    from compare_image_pair import ensure_rgb

    for name_a, name_b in zip(filenames_a, filenames_b):
        image_a = ensure_rgb(iio.imread(pjoin(folder_a, name_a)))
        image_b = ensure_rgb(iio.imread(pjoin(folder_b, name_b)))

        rows.append({
            "name": name_a,
            "ssim": ssim(image_a, image_b),
            "psnr": psnr(image_a, image_b),
            "lpips": lpips(image_a, image_b),
            "mifd": mifd(image_a, image_b),
        })

    per_metric = {metric: [row[metric] for row in rows]
                  for metric in ("ssim", "psnr", "lpips", "mifd")}
    summary = {metric: float(np.nanmean(values))
               for metric, values in per_metric.items()}

    results = {"pairs": rows, "mean": summary}
    skipped = metric_skip_notes(per_metric)
    if skipped:
        # Label fully-absent metrics (e.g. LPIPS without weights) instead of
        # leaving a silent NaN column.
        results["skipped"] = skipped
    return results


def to_latex(results: dict) -> str:
    lines = [r"\begin{tabular}{lrrrr}",
             r"Image & SSIM & PSNR & LPIPS & MIFD \\", r"\hline"]

    for row in results["pairs"]:
        lines.append(f"{row['name']} & {row['ssim']:.3f} & {row['psnr']:.2f} & "
                     f"{row['lpips']:.3f} & {row['mifd']:.2f} \\\\")

    mean = results["mean"]
    skipped = results.get("skipped", {})

    def cell(metric, spec):
        return skipped.get(metric) or format(mean[metric], spec)

    lines.append(r"\hline")
    lines.append(f"Mean & {cell('ssim', '.3f')} & {cell('psnr', '.2f')} & "
                 f"{cell('lpips', '.3f')} & {cell('mifd', '.2f')} \\\\")
    lines.append(r"\end{tabular}")

    return "\n".join(lines)


def main():
    parser = argparse.ArgumentParser(
        description="Compare folders of corresponding images.")
    parser.add_argument("folder_a", type=str)
    parser.add_argument("folder_b", type=str)
    parser.add_argument("--latex", action="store_true", help="Emit a LaTeX table.")
    args = parser.parse_args()

    results = compare_folders(args.folder_a, args.folder_b)

    if args.latex:
        print(to_latex(results))
    else:
        for row in results["pairs"]:
            print(f"{row['name']}: ssim={row['ssim']:.3f} psnr={row['psnr']:.2f} "
                  f"lpips={row['lpips']:.3f} mifd={row['mifd']:.2f}")

        mean = results["mean"]
        print(f"mean: ssim={mean['ssim']:.3f} psnr={mean['psnr']:.2f} "
              f"lpips={mean['lpips']:.3f} mifd={mean['mifd']:.2f}")
        for metric, reason in results.get("skipped", {}).items():
            print(f"note: {metric} {reason}")


if __name__ == "__main__":
    main()
