"""Prompt/image processors — behavioral parity with the reference processors.

* :class:`Phi3Processor` — text path (reference ``Phi3FProcessor``,
  /root/reference/phi.py:228-250): single prompts tokenize straight; batches
  are **left-padded** with id 0, per-row position ids restart at 0 (pads get
  pid 1) and a binary attention mask marks real tokens.
* :class:`Phi3VProcessor` — vision path (reference ``Phi3VProcessor._merge``,
  phi.py:252-281): splits on ``<|image_N|>`` tags, interleaves runs of
  negative placeholder ids of length ``num_img_tokens[N-1]``, and returns the
  scatter positions (argwhere of negative ids).  Vision is batch-size-1, as
  in the reference (enforced at phi_3_vision_mlx.py:377-378).

Everything returns NumPy; the engine moves data to device.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

from .tokenizer import load_tokenizer

_IMG_TAG = re.compile(r"<\|image_\d+\|>")


class Phi3Processor:
    def __init__(self, local_dir: Optional[str] = None, tokenizer=None):
        self.tokenizer = tokenizer if tokenizer is not None else load_tokenizer(local_dir or "")

    def _tokenize(self, texts):
        if isinstance(texts, str):
            return {"input_ids": np.array(self.tokenizer(texts).input_ids)[None]}
        input_ids: List[List[int]] = self.tokenizer(texts).input_ids
        max_length = max(len(row) for row in input_ids)
        pids = [
            [1] * (max_length - len(row)) + list(range(len(row))) for row in input_ids
        ]
        mask = [
            [0] * (max_length - len(row)) + [1] * len(row) for row in input_ids
        ]
        padded = [[0] * (max_length - len(row)) + row for row in input_ids]
        return {
            "input_ids": np.array(padded, np.int32),
            "pids": np.array(pids, np.int32),
            "mask": np.array(mask, np.int32),
        }

    def __call__(self, texts, images=None):
        if images is not None:
            print("WARNING: You are using phi3_mini_128k. Use phi3_v for VLM tasks.")
        return self._tokenize(texts)


class Phi3VProcessor(Phi3Processor):
    def __init__(self, local_dir: Optional[str] = None, tokenizer=None):
        super().__init__(local_dir, tokenizer)
        from .image_processor import Phi3VImageProcessor

        self.img_processor = Phi3VImageProcessor()

    def __call__(self, texts, images=None):
        if images is None:
            return self._tokenize(texts)
        import os

        raw = os.environ.get("PHI3V_TPU_DEVICE_IMAGE", "1") == "1"
        image_inputs = self.img_processor(images, raw=raw)
        return self._merge(image_inputs, texts)

    def _merge(self, images, texts):
        prompt_chunks = self.tokenizer(re.split(_IMG_TAG, texts)).input_ids
        num_img_tokens = images["num_img_tokens"]
        image_tags = re.findall(_IMG_TAG, texts)
        image_ids = [int(s.split("|")[1].split("_")[-1]) for s in image_tags]
        image_ids_pad = [[-iid] * num_img_tokens[iid - 1] for iid in image_ids]
        if len(prompt_chunks) > len(image_ids_pad):
            image_ids_pad = image_ids_pad + [[]]
        input_ids: List[int] = []
        for chunk, pad in zip(prompt_chunks, image_ids_pad):
            input_ids.extend(chunk)
            input_ids.extend(pad)
        input_ids = np.array(input_ids, np.int32)[None]
        positions = np.argwhere(input_ids < 0)
        out = {
            "input_ids": input_ids,
            "image_sizes": np.asarray(images["image_sizes"], np.int32),
            "positions": positions.astype(np.int32),
        }
        if "raw_images" in images:
            out["raw_images"] = images["raw_images"]  # device-side resize too
            out["resize_plans"] = images["resize_plans"]
        elif "hd_images" in images:
            out["hd_images"] = images["hd_images"]  # device-side pipeline
        else:
            out["pixel_values"] = np.asarray(images["pixel_values"], np.float32)
        return out
