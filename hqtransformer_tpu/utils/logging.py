"""Run logging: rank-zero file log, saved config, TensorBoard scalars and
periodic image grids — the `CustomLogger` surface
(`hqvae/utils/logger.py:17-110`) without Lightning.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np


class RunLogger:
    def __init__(self, result_path: str, config=None, enabled: bool = True,
                 img_logging_freq: int = 5000):
        self.enabled = enabled
        self.result_path = result_path
        self.img_logging_freq = img_logging_freq
        self.tb = None
        if not enabled:
            return
        os.makedirs(result_path, exist_ok=True)
        self.log = logging.getLogger('train')
        self.log.setLevel(logging.INFO)
        fh = logging.FileHandler(os.path.join(result_path, 'train.log'))
        fh.setFormatter(logging.Formatter('%(asctime)s %(message)s'))
        self.log.addHandler(fh)
        self.log.addHandler(logging.StreamHandler())
        if config is not None:
            from ..config import save_config
            save_config(config, os.path.join(result_path, 'config.yaml'))
        try:
            from tensorboardX import SummaryWriter
            self.tb = SummaryWriter(os.path.join(result_path, 'tb'))
        except ImportError:
            self.tb = None

    def scalars(self, metrics: Dict[str, float], step: int,
                prefix: str = 'train'):
        if not self.enabled:
            return
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f'{prefix}/{k}', float(v), step)

    def line(self, msg: str):
        if self.enabled:
            self.log.info(msg)

    def images(self, tag: str, images: np.ndarray, step: int,
               max_images: int = 8):
        """images: [B, H, W, C] in [0, 1]; logged as one horizontal grid
        (the input/recon grids of `logger.py:49-73`)."""
        if not self.enabled or self.tb is None:
            return
        arr = np.clip(np.asarray(images[:max_images]), 0, 1)
        B, H, W, C = arr.shape
        grid = arr.transpose(1, 0, 2, 3).reshape(H, B * W, C)
        self.tb.add_image(tag, grid, step, dataformats='HWC')

    def close(self):
        if self.tb is not None:
            self.tb.close()
