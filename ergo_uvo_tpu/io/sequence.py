"""Frame sources: the ingestion boundary between host IO and device compute.

The reference consumes `sensor_msgs/CompressedImage` + `sensor_msgs/Range`
topics through ROS callbacks with queue-size-1 drop semantics
(visual_odometry.h:67-95, :766-785).  Here ingestion is an explicit host-side
iterator of fixed-shape frame batches; decode (JPEG/Bayer) happens on the host
(optionally via the native C extension in `io/native/`), preprocessing and
everything after runs on device.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional

import numpy as np


class FrameBatch(NamedTuple):
    imgs: np.ndarray  # (B, H, W) or (B, H, W, 3)
    imgs_right: Optional[np.ndarray]  # stereo
    timestamps: np.ndarray  # (B,)
    ranges: Optional[np.ndarray]  # (B,) mono range sensor


class FrameSource:
    """Interface: iterate fixed-size frame batches."""

    def batches(self, batch_size: int) -> Iterator[FrameBatch]:
        raise NotImplementedError


class ArraySource(FrameSource):
    """In-memory source over preloaded arrays (tests, benchmarks, replays)."""

    def __init__(self, imgs, timestamps, ranges=None, imgs_right=None):
        self.imgs = np.asarray(imgs)
        self.timestamps = np.asarray(timestamps)
        self.ranges = None if ranges is None else np.asarray(ranges)
        self.imgs_right = None if imgs_right is None else np.asarray(imgs_right)

    def __len__(self):
        return len(self.imgs)

    def batches(self, batch_size: int) -> Iterator[FrameBatch]:
        n = len(self.imgs)
        for i in range(0, n - n % batch_size, batch_size):
            sl = slice(i, i + batch_size)
            yield FrameBatch(
                imgs=self.imgs[sl],
                imgs_right=None if self.imgs_right is None else self.imgs_right[sl],
                timestamps=self.timestamps[sl],
                ranges=None if self.ranges is None else self.ranges[sl],
            )
