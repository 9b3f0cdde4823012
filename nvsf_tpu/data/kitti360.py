"""KITTI-360 dataset: transforms-json scene + 3D bbox annotations
(rebuilds ``nvsf/nerf/dataset/kitti360_dataset.py``)."""

from __future__ import annotations

import os
from typing import Optional

from nvsf_tpu.data.dataset import SceneData, load_scene
from nvsf_tpu.preprocess.kitti360 import SEQUENCE_SPLITS, load_3d_annotations


def load_kitti360_scene(cfg, split: str, novel_sensor: Optional[dict] = None
                        ) -> SceneData:
    """Build a SceneData for one KITTI-360 sequence split; attaches 3D
    annotations when the raw source tree is present
    (``kitti360_dataset.py:51-79``)."""
    scene = load_scene(
        cfg.path, str(cfg.sequence_id), split,
        scale=cfg.scale, offset=cfg.offset,
        enable_lidar=cfg.enable_lidar, enable_rgb=cfg.enable_rgb,
        intrinsics_lidar=cfg.intrinsics_lidar,
        intrinsics_hoz_lidar=cfg.intrinsics_hoz_lidar,
        novel_sensor=novel_sensor)
    source = os.path.join(cfg.path, "source_data")
    if os.path.isdir(source):
        recording = "2013_05_28_drive_0000"
        fids = [int(f) for f in scene.frame_ids]
        scene.annotations = load_3d_annotations(source, recording, fids)
    return scene
