"""Dataset acquisition: fetch + extract Make3D / NYU archives (SURVEY §2.1
"Dataset downloader", §3.4). One-shot, host-only, I/O bound.

Offline-safe: this environment has no network (SURVEY §0 [ENV]), so every
fetch is gated — if the archive is already present (pre-populated data dir)
we extract/verify and continue; otherwise we fail with the exact URL list so
a user can stage files manually. Layout produced:

    <data_dir>/make3d/
        Train400Img/         img-*.jpg
        Train400Depth/       depth_sph_corr-*.mat   (Position3DGrid 55x305x4)
        Test134/             img-*.jpg
        Gridlaserdata/       depth_sph_corr-*.mat
    <data_dir>/nyu/
        nyu_depth_v2_labeled.mat                    (HDF5 v7.3)
"""

from __future__ import annotations

import logging
import os
import tarfile
import urllib.error
import urllib.request

log = logging.getLogger(__name__)

MAKE3D_BASE = "http://cs.stanford.edu/group/reconstruction3d"
NYU_BASE = "http://horatio.cs.nyu.edu/mit/silberman/nyu_depth_v2"

ARCHIVES = {
    "make3d": [
        # (url, extract_into_subdir)
        (f"{MAKE3D_BASE}/Train400Img.tar.gz", "make3d"),
        (f"{MAKE3D_BASE}/Train400Depth.tgz", "make3d"),
        (f"{MAKE3D_BASE}/Test134.tar.gz", "make3d"),
        (f"{MAKE3D_BASE}/Test134Depth.tar.gz", "make3d"),
    ],
    "nyu": [
        (f"{NYU_BASE}/nyu_depth_v2_labeled.mat", "nyu"),
    ],
}


def _fetch(url: str, dest: str) -> bool:
    """Download url -> dest. Returns False (with log) when offline."""
    if os.path.exists(dest):
        return True
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    try:
        log.info("fetching %s", url)
        with urllib.request.urlopen(url, timeout=30) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
        return True
    except (urllib.error.URLError, OSError) as e:
        log.warning("fetch failed (%s); offline?", e)
        if os.path.exists(tmp):
            os.remove(tmp)
        return False


def _extract(archive: str, into: str) -> None:
    if archive.endswith((".tar.gz", ".tgz", ".tar")):
        log.info("extracting %s", archive)
        with tarfile.open(archive) as tf:
            tf.extractall(into, filter="data")
    # .mat archives (NYU) are used in place, no extraction.


def download(dataset: str, data_dir: str) -> None:
    """Ensure `dataset` is laid out under data_dir; fetch if reachable."""
    if dataset not in ARCHIVES:
        raise KeyError(f"unknown dataset {dataset!r}; have {sorted(ARCHIVES)}")
    missing = []
    for url, sub in ARCHIVES[dataset]:
        fname = os.path.join(data_dir, sub, os.path.basename(url))
        if _fetch(url, fname):
            _extract(fname, os.path.join(data_dir, sub))
        else:
            missing.append(url)
    if missing:
        raise RuntimeError(
            f"could not fetch {dataset} archives (offline?). Stage these "
            f"files under {os.path.join(data_dir, dataset)}/ manually:\n  "
            + "\n  ".join(missing))
    log.info("%s ready under %s", dataset, data_dir)
