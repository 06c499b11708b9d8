"""`python -m dgvcc_tpu` == the `dgvcc-tpu` console script.

Mirrors the reference's `python main.py --task ...` entry
(/root/reference/main.py:21-42) with the same task/flag surface;
see dgvcc_tpu/cli/main.py.
"""

from dgvcc_tpu.cli.main import main

if __name__ == "__main__":
    main()
