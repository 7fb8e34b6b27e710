"""Phoneme/frame alignment utilities.

Parity targets:
- ``StyleSingingBinarizer.process_align`` (``data_gen/style_binarizer.py:393-404``):
  note-level phoneme durations (seconds) -> per-frame phoneme index map
  ``mel2ph`` (1-based; 0 = padding).
- ``mel2ph_to_dur`` (``modules/fastspeech/tts_modules.py:241-247``):
  frame map -> per-phone frame counts via a segment sum.
- ``expand_states`` (``modules/StyleSinger/stylesinger.py:15-19``): gather
  phone-level hiddens to frame level.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mel2ph_from_durs_np(ph_durs: np.ndarray, n_frames: int, *,
                        hop_size: int, sample_rate: int) -> np.ndarray:
    """Cumulative-time rounding of per-phone durations (seconds) to frames."""
    ph_durs = np.asarray(ph_durs, dtype=np.float64)
    ends = np.cumsum(ph_durs)
    starts = np.concatenate([[0.0], ends[:-1]])
    start_f = np.floor(starts * sample_rate / hop_size + 0.5).astype(np.int64)
    end_f = np.floor(ends * sample_rate / hop_size + 0.5).astype(np.int64)
    mel2ph = np.zeros([n_frames], dtype=np.int64)
    for i, (s, e) in enumerate(zip(start_f, end_f)):
        mel2ph[s:min(e, n_frames)] = i + 1
    return mel2ph


def mel2ph_to_dur(mel2ph: jnp.ndarray, t_txt: int,
                  max_dur: Optional[int] = None) -> jnp.ndarray:
    """[B, T_mel] 1-based frame map -> [B, T_txt] per-phone frame counts."""
    one = jnp.ones_like(mel2ph)
    dur = jax.vmap(
        lambda m, o: jnp.zeros([t_txt + 1], dtype=mel2ph.dtype).at[m].add(o)
    )(mel2ph, one)[:, 1:]
    if max_dur is not None:
        dur = jnp.minimum(dur, max_dur)
    return dur


def expand_states(h: jnp.ndarray, mel2ph: jnp.ndarray) -> jnp.ndarray:
    """Gather phone-level hiddens [B, T_txt, H] to frames [B, T_mel, H].

    ``mel2ph`` is 1-based; index 0 selects a zero vector (padding).
    """
    h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))
    return jnp.take_along_axis(h, mel2ph[..., None], axis=1)


def group_hidden_by_segs(h: jnp.ndarray, seg_ids: jnp.ndarray,
                         max_len: int):
    """Segment-mean of frame hiddens by 1-based segment ids.

    Parity target: ``group_hidden_by_segs`` (``utils/tts_utils.py:357-371``
    in AaronZ345/StyleSinger): scatter-add frames into per-segment sums,
    divide by counts.  h: [B, T, H], seg_ids: [B, T] -> ([B, max_len, H],
    counts [B, max_len]).
    """
    b, t, hid = h.shape

    def one(hb, sb):
        sums = jnp.zeros((max_len + 1, hid), h.dtype).at[sb].add(hb)
        cnt = jnp.zeros((max_len + 1,), h.dtype).at[sb].add(1.0)
        return sums[1:], cnt[1:]

    sums, cnt = jax.vmap(one)(h, seg_ids)
    return sums / jnp.maximum(cnt[..., None], 1.0), cnt
