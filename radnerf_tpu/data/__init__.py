"""Data layer (L0 twin of the reference's datasets/ package).

All loaders produce numpy arrays on the host; ray batches are assembled
device-side by the trainer (a deliberate improvement over the reference's
`num_workers=0` host-side sampling — SURVEY.md §8 quirk 10).
"""

from .base import BaseDataset  # noqa: F401


def _lazy(name):
    def load(*a, **k):
        import importlib

        mod, cls = name.rsplit(".", 1)
        return getattr(importlib.import_module(mod, __package__), cls)(*a, **k)

    return load


# Registry mirroring datasets/__init__.py:13-23 (same keys).
dataset_dict = {
    "nerf": _lazy(".nerf.NeRFDataset"),
    "nsvf": _lazy(".nsvf.NSVFDataset"),
    "colmap": _lazy(".colmap.ColmapDataset"),
    "nerfpp": _lazy(".nerfpp.NeRFPPDataset"),
    "rtmv": _lazy(".rtmv.RTMVDataset"),
    "scannet": _lazy(".scannet.ScanNetDataset"),
    "replica": _lazy(".replica.ReplicaDataset"),
    "360v2": _lazy(".nerf360v2.NeRF360v2Dataset"),
    "mill19": _lazy(".mill19.Mill19Dataset"),
    "eyeful": _lazy(".eyeful.EyefulDataset"),
}
