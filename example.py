"""Minimal file-to-file super-resolution (reference: example.py:1-13)."""

import sys

import numpy as np
import scipy.io.wavfile as wavfile

from flowhigh_tpu import FlowHighSR

in_path = sys.argv[1] if len(sys.argv) > 1 else "input.wav"
out_path = sys.argv[2] if len(sys.argv) > 2 else "output.wav"
ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else None

if ckpt_dir:
    model = FlowHighSR.from_local(ckpt_dir)
else:
    model = FlowHighSR.from_pretrained(device=None)

sr, wav = wavfile.read(in_path)
wav = wav.astype(np.float32)
high_res = model.generate(wav, sr, 48000, timestep=1)
wavfile.write(out_path, 48000,
              (np.clip(high_res[0], -1, 1) * 32767).astype(np.int16))
