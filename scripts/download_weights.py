#!/usr/bin/env python
"""Fetch/convert model weights into $WEIGHTS_PATH.

Role parity with reference scripts/download_weights.py:22-41 (which
pre-downloaded Detectron2 + LPIPS weights). This environment has no network
egress, so this script instead:

* reports which weight files are present/missing;
* converts any released torch checkpoints found on disk into the framework's
  .npz layouts;
* prints the URLs to fetch on a connected machine.

For one-command conversion of a folder of downloaded checkpoints, prefer
``python -m hive_tpu.models.convert --all <dir>`` (glob name search +
torch-hub SHA256 verification).
"""

import os
import sys

# Allow running straight from a checkout: scripts/ is on sys.path, the
# package root is not.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

WEIGHT_SPECS = [
    {
        "filename": "dpt_hybrid_nyu.npz",
        "source": "dpt_hybrid_nyu.pt",
        "url": "https://github.com/intel-isl/DPT/releases/download/1_0/"
               "dpt_hybrid_nyu-2ce69ec7.pt",
        "converter": "hive_tpu.models.dpt.convert_torch_checkpoint",
    },
    {
        "filename": "big-lama.npz",
        "source": "big-lama/models/best.ckpt",
        "url": "https://huggingface.co/smartywu/big-lama (big-lama.zip)",
        "converter": "hive_tpu.models.lama.convert_torch_checkpoint",
    },
    {
        "filename": "maskrcnn_coco.npz",
        "source": "maskrcnn_resnet50_fpn_coco-bf2d0c1e.pth",
        "url": "https://download.pytorch.org/models/"
               "maskrcnn_resnet50_fpn_coco-bf2d0c1e.pth",
        "converter": "hive_tpu.models.maskrcnn.convert_torch_checkpoint",
    },
    {
        "filename": "lpips_alex.npz",
        "source": "alexnet-owt-7be5be79.pth",
        "url": "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth "
               "+ https://github.com/richzhang/PerceptualSimilarity/raw/master/"
               "lpips/weights/v0.1/alex.pth",
        "converter": "hive_tpu.models.lpips.convert_torch_checkpoint",
    },
    {
        "filename": "person_unet.npz",
        "source": None,
        "url": "(optional lightweight fallback: train or distil a "
               "person-segmentation U-Net; see hive_tpu/models/segmentation.py)",
        "converter": None,
    },
]


def main():
    parser = argparse.ArgumentParser(description="Check/convert model weights.")
    parser.add_argument("--weights_path", type=str,
                        default=os.environ.get("WEIGHTS_PATH", "weights"),
                        help="Folder holding the model weights.")
    args = parser.parse_args()

    weights_path = args.weights_path
    os.makedirs(weights_path, exist_ok=True)

    for spec in WEIGHT_SPECS:
        target = os.path.join(weights_path, spec["filename"])

        if os.path.isfile(target):
            print(f"[ok]      {spec['filename']}")
            continue

        source = os.path.join(weights_path, spec["source"]) if spec["source"] else None

        if source and os.path.isfile(source) and spec["converter"]:
            module_name, func_name = spec["converter"].rsplit(".", 1)
            module = __import__(module_name, fromlist=[func_name])
            getattr(module, func_name)(source, target)
            print(f"[converted] {spec['filename']} (from {spec['source']})")
        else:
            print(f"[missing] {spec['filename']} — fetch {spec['url']} "
                  f"and place it at {source or target}")


if __name__ == "__main__":
    main()
