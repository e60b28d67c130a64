"""Pack training data (poses / textures / backgrounds) into native tensor
stores for the C++ batch sampler.

One-off preprocessing: decodes every LSUN background jpg once, resizes to the
proxy size, and writes fixed-record .bin stores. Afterwards the training input
pipeline does zero image decoding — batches are assembled by mmap+memcpy on
C++ threads (data/native_loader.py).

Usage: python -m hierarchicalprobabilistic3dhuman_tpu.data.pack_training_stores \
           --out_dir ./train_files/native [--img_wh 256]
"""

import argparse
import os

import cv2
import numpy as np

from hierarchicalprobabilistic3dhuman_tpu.configs import paths
from hierarchicalprobabilistic3dhuman_tpu.data.native_loader import write_tensor_store


def pack_backgrounds(backgrounds_dir, out_path, img_wh=256, limit=None):
    fnames = sorted(f for f in os.listdir(backgrounds_dir) if f.endswith(".jpg"))
    if limit:
        fnames = fnames[:limit]
    out = np.empty((len(fnames), 3, img_wh, img_wh), np.uint8)
    for i, f in enumerate(fnames):
        bg = cv2.cvtColor(cv2.imread(os.path.join(backgrounds_dir, f)),
                          cv2.COLOR_BGR2RGB)
        bg = cv2.resize(bg, (img_wh, img_wh), interpolation=cv2.INTER_LINEAR)
        out[i] = np.transpose(bg, (2, 0, 1))
    return write_tensor_store(out_path, out)


def pack_poses(poses_path, out_path):
    data = np.load(poses_path)
    return write_tensor_store(out_path, np.asarray(data["poses"], np.float32))


def pack_textures(textures_path, out_path):
    data = np.load(textures_path)
    tex = np.concatenate([data["grey"], data["nongrey"]], axis=0)
    return write_tensor_store(out_path, np.asarray(tex, np.uint8))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--img_wh", type=int, default=256)
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    pack_poses(paths.TRAIN_POSES_PATH, os.path.join(args.out_dir, "poses.bin"))
    pack_textures(paths.TRAIN_TEXTURES_PATH,
                  os.path.join(args.out_dir, "textures.bin"))
    pack_backgrounds(paths.TRAIN_BACKGROUNDS_PATH,
                     os.path.join(args.out_dir, "backgrounds.bin"),
                     img_wh=args.img_wh)
    print(f"Packed stores into {args.out_dir}")
