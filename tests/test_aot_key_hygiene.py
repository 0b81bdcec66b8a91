"""AOT export-cache key hygiene (round-4 incident regression).

The MSM v6 AOT family re-exports in ~20+ min after any edit to a file in
its deps list; round 4 lost its driver bench to a last-minute edit of the
HOST-side basis disk cache, which then lived in the same file as the
kernels.  The kernels now live in `ec/msm6k.py` and the deps list covers
that file INSTEAD of the host driver `ec/msm6.py` -- these tests pin, by
actual hash comparison over a copied tree, that editing the host glue
leaves the export key untouched while editing the kernel file changes it.
"""

from __future__ import annotations

import shutil

import quill_tpu
from quill_tpu.ec import msm6k
from quill_tpu.utils import aotcache


def _copy_pkg(tmp_path):
    dst = tmp_path / "quill_tpu"
    shutil.copytree(quill_tpu.__path__[0], dst,
                    ignore=shutil.ignore_patterns("__pycache__"))
    return dst


def _hash(root):
    return aotcache._hash_paths(
        aotcache._dep_paths(msm6k.EC_KDEPS, root), root)


def test_host_glue_edit_keeps_msm_export_key(tmp_path):
    root = _copy_pkg(tmp_path)
    before = _hash(root)
    with open(root / "ec" / "msm6.py", "a") as f:
        f.write("\n# host-side glue edit (disk cache tweak)\n")
    assert _hash(root) == before


def test_kernel_edit_changes_msm_export_key(tmp_path):
    root = _copy_pkg(tmp_path)
    before = _hash(root)
    with open(root / "ec" / "msm6k.py", "a") as f:
        f.write("\n# kernel-side edit\n")
    assert _hash(root) != before


def test_msm6_host_file_not_in_any_kdeps():
    """No kernel family may list the host driver file as a lowering dep."""
    from quill_tpu.ec import msm3, msm5, msm8

    for deps in (msm6k.EC_KDEPS, msm3.EC_KDEPS, msm5.EC_KDEPS,
                 msm8.EC_KDEPS):
        assert "ec/msm6.py" not in deps
    # and the host driver itself must define no aot_wrap'ed kernels
    import pathlib

    src = (pathlib.Path(quill_tpu.__path__[0]) / "ec" / "msm6.py"
           ).read_text()
    assert "aot_wrap(" not in src
