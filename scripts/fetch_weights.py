#!/usr/bin/env python3
"""Fetch the ImageNet-pretrained backbones the reference self-serves.

The reference downloads these implicitly at model construction
(torchvision: models.py:35, models2.py:32; model_zoo:
SW/backbones/resnet.py:12-18, SW/backbones/densenet.py:13-17; IBN
release: ibnnet/resnet_ibn.py:15-22). dgvcc_tpu keeps weight loading
explicit — configs point at .pth files via

    pretrained_weights:
      vgg16_bn: pretrained/vgg16_bn-6c64b313.pth

(train/trainer.py:218-231) — and this script populates that directory:

    python scripts/fetch_weights.py                 # the common set
    python scripts/fetch_weights.py --all           # everything
    python scripts/fetch_weights.py vgg16_bn vgg19  # named entries
    python scripts/fetch_weights.py --list          # show the manifest

Integrity: torch-hub filenames embed the leading hex of the file's
SHA-256 (the `-6c64b313` suffix); every download is hashed and checked
against that embedded prefix, exactly like torch.hub.load_state_dict_
from_url does.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import re
import sys
import urllib.request

_TORCH = "https://download.pytorch.org/models"
_IBN = "https://github.com/XingangPan/IBN-Net/releases/download/v1.0"

# name → URL. Sources: torchvision model zoo (urls mirrored in
# reference SW/backbones/{resnet,densenet,vgg}.py and BL.py) and the
# IBN-Net v1.0 release (reference ibnnet/resnet_ibn.py:15-22).
MANIFEST = {
    # VGG (DG encoders, generators, BL, CSRNet, SASNet, DSSINet)
    "vgg16": f"{_TORCH}/vgg16-397923af.pth",
    "vgg16_bn": f"{_TORCH}/vgg16_bn-6c64b313.pth",
    "vgg19": f"{_TORCH}/vgg19-dcbb9e9d.pth",
    "vgg19_bn": f"{_TORCH}/vgg19_bn-c79401a0.pth",
    # ResNets (SW counter trunk zoo, SW/backbones/resnet.py:12-18)
    "resnet18": f"{_TORCH}/resnet18-5c106cde.pth",
    "resnet34": f"{_TORCH}/resnet34-333f7ec4.pth",
    "resnet50": f"{_TORCH}/resnet50-19c8e357.pth",
    "resnet101": f"{_TORCH}/resnet101-5d3b4d8f.pth",
    "resnet152": f"{_TORCH}/resnet152-b121ed2d.pth",
    # DenseNets (SW/IBN densenet variants, SW/backbones/densenet.py)
    "densenet121": f"{_TORCH}/densenet121-a639ec97.pth",
    "densenet169": f"{_TORCH}/densenet169-b2777c0a.pth",
    "densenet201": f"{_TORCH}/densenet201-c1103571.pth",
    "densenet161": f"{_TORCH}/densenet161-8d451a50.pth",
    # IBN-Net release weights (ibnnet/resnet_ibn.py:15-22)
    "resnet18_ibn_a": f"{_IBN}/resnet18_ibn_a-2f571257.pth",
    "resnet34_ibn_a": f"{_IBN}/resnet34_ibn_a-94bc1577.pth",
    "resnet50_ibn_a": f"{_IBN}/resnet50_ibn_a-d9d0bb7b.pth",
    "resnet101_ibn_a": f"{_IBN}/resnet101_ibn_a-59ea0ac6.pth",
    "resnet18_ibn_b": f"{_IBN}/resnet18_ibn_b-bc2f3c11.pth",
    "resnet34_ibn_b": f"{_IBN}/resnet34_ibn_b-04134c37.pth",
    "resnet50_ibn_b": f"{_IBN}/resnet50_ibn_b-9ca61e85.pth",
    "resnet101_ibn_b": f"{_IBN}/resnet101_ibn_b-c55f6dba.pth",
}

# what a typical DG + baselines workflow needs
DEFAULT_SET = ("vgg16_bn", "vgg19", "resnet50", "resnet50_ibn_b")


def sha_prefix_of(url: str) -> str:
    """The integrity prefix torch-hub embeds in the filename."""
    m = re.search(r"-([0-9a-f]{8,})\.pth$", url)
    if m is None:
        raise ValueError(f"no hash prefix in {url}")
    return m.group(1)


def verify(path: str, url: str) -> None:
    want = sha_prefix_of(url)
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    got = h.hexdigest()
    if not got.startswith(want):
        raise RuntimeError(
            f"{os.path.basename(path)}: sha256 {got[:12]}… does not match "
            f"the manifest prefix {want} — corrupt or tampered download")


def fetch(name: str, dest: str) -> str:
    url = MANIFEST[name]
    os.makedirs(dest, exist_ok=True)
    path = os.path.join(dest, os.path.basename(url))
    if os.path.exists(path):
        verify(path, url)
        print(f"  {name}: already present, hash OK")
        return path
    tmp = path + ".part"
    print(f"  {name}: downloading {url}")
    with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    verify(tmp, url)
    os.replace(tmp, path)
    return path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("names", nargs="*",
                    help=f"manifest entries (default: {', '.join(DEFAULT_SET)})")
    ap.add_argument("--dest", default="pretrained",
                    help="download directory (default: ./pretrained)")
    ap.add_argument("--all", action="store_true", help="fetch everything")
    ap.add_argument("--list", action="store_true", help="print the manifest")
    args = ap.parse_args(argv)

    if args.list:
        for k, v in MANIFEST.items():
            print(f"{k:18s} {v}")
        return 0
    names = (list(MANIFEST) if args.all
             else list(args.names) or list(DEFAULT_SET))
    unknown = [n for n in names if n not in MANIFEST]
    if unknown:
        ap.error(f"unknown entries {unknown}; see --list")
    print(f"Fetching {len(names)} weight file(s) into {args.dest}/")
    got = {n: fetch(n, args.dest) for n in names}
    print("\nConfig snippet (paste under your YAML):\n")
    print("pretrained_weights:")
    for n, p in got.items():
        print(f"  {n}: {p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
