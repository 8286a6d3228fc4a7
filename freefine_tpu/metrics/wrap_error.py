"""WRAP_E — warp error (reference evaluation/metrics/wrap_error.py:5-21).

Mean L1 between the coarse input and the generated image inside the target
mask: per case, sum |coarse*m - gen*m| / m.sum() with the mask replicated
over 3 channels (exactly the reference's normalisation), averaged.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def wrap_error_single(
    coarse: np.ndarray, generated: np.ndarray, tgt_mask: np.ndarray
) -> float:
    c = np.asarray(coarse, np.float64) / 255.0
    g = np.asarray(generated, np.float64) / 255.0
    m = np.asarray(tgt_mask, np.float64) / 255.0
    if m.ndim == 3:
        m = m[..., 0]
    mask3 = np.repeat(m[..., None], 3, axis=2)
    denom = mask3.sum()
    if denom == 0:
        return 0.0
    return float(np.abs(c * mask3 - g * mask3).sum() / denom)


def wrap_error(data: Dict, image_label: str = "gen_img_path") -> float:
    """Over the merged results JSON (nested schema of SURVEY.md §2.4)."""
    from PIL import Image

    total, num = 0.0, 0
    for image in data.values():
        for instance in image["instances"].values():
            for sample in instance.values():
                coarse = np.array(Image.open(sample["coarse_input_path"]))
                gen = np.array(Image.open(sample[image_label]))
                mask = np.array(Image.open(sample["tgt_mask_path"]))
                total += wrap_error_single(coarse, gen, mask)
                num += 1
    return total / max(num, 1)
