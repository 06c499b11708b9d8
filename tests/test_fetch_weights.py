"""Weight manifest (scripts/fetch_weights.py): offline invariants +
network-guarded download."""

import hashlib
import os
import socket
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import fetch_weights as fw  # noqa: E402


def test_manifest_filenames_embed_hash_prefix():
    """Every URL follows the torch-hub convention the verifier relies
    on: `name-<sha256 prefix>.pth`."""
    for name, url in fw.MANIFEST.items():
        assert fw.sha_prefix_of(url), name
        assert url.startswith("https://"), name
    assert set(fw.DEFAULT_SET) <= set(fw.MANIFEST)


def test_verify_checks_hash(tmp_path):
    p = tmp_path / "dummy-deadbeef.pth"
    p.write_bytes(b"not the weights")
    with pytest.raises(RuntimeError, match="does not match"):
        fw.verify(str(p), "https://x/dummy-deadbeef.pth")
    # a file named by its true hash prefix passes
    data = b"weights!"
    h = hashlib.sha256(data).hexdigest()[:8]
    good = tmp_path / f"ok-{h}.pth"
    good.write_bytes(data)
    fw.verify(str(good), f"https://x/ok-{h}.pth")


def test_cli_list_mode():
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(fw.__file__),
                                      "fetch_weights.py"), "--list"],
        capture_output=True, text=True)
    assert out.returncode == 0
    assert "vgg16_bn" in out.stdout and "resnet50_ibn_b" in out.stdout


def _online(host="download.pytorch.org"):
    try:
        socket.create_connection((host, 443), timeout=3).close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _online(), reason="no network egress")
def test_fetch_downloads_and_verifies(tmp_path):
    path = fw.fetch("vgg16", str(tmp_path))
    assert os.path.exists(path)
    fw.verify(path, fw.MANIFEST["vgg16"])
