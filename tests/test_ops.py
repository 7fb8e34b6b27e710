"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.mel import wav2mel
from stylesinger_tpu.ops import mel_spectrogram


def test_mel_pallas_matches_xla(rng):
    wav = rng.standard_normal(48000).astype(np.float32) * 0.3
    ref = np.asarray(wav2mel(jnp.asarray(wav)))
    ours = np.asarray(mel_spectrogram(jnp.asarray(wav), interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=2e-3)


def test_mel_pallas_small_input(rng):
    wav = rng.standard_normal(2048).astype(np.float32)
    out = np.asarray(mel_spectrogram(
        jnp.asarray(wav), sample_rate=24000, n_fft=512, hop_size=128,
        win_length=512, n_mels=40, fmax=12000, interpret=True))
    ref = np.asarray(wav2mel(jnp.asarray(wav), sample_rate=24000, n_fft=512,
                             hop_size=128, win_length=512, n_mels=40,
                             fmax=12000.0))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=2e-3)


def test_mrf_pallas_matches_flax_resblocks(rng):
    """Fused Pallas MRF group == blocked flax ResBlock1 path (same
    weights, same overlap-save blocks/masks)."""
    import jax

    from stylesinger_tpu.models.hifigan import ResBlock1, _blockify
    from stylesinger_tpu.ops.mrf_pallas import fused_mrf_blocks

    c, block = 16, 64
    rk, rd = (3, 7, 11), ((1, 3, 5),) * 3
    halo = max(ResBlock1.halo(k, d) for k, d in zip(rk, rd))
    x = jnp.asarray(rng.standard_normal((1, 150, c)).astype(np.float32))
    xb, mask, t = _blockify(x, block, halo)

    key = jax.random.PRNGKey(0)
    blocks = [ResBlock1(c, k, d) for k, d in zip(rk, rd)]
    variables = [b.init(key, xb, mask) for b in blocks]
    ref = sum(np.asarray(b.apply(v, xb, mask))
              for b, v in zip(blocks, variables)) / len(blocks)
    ref = ref[:, halo:halo + block]  # kernel output is halo-cropped

    weights = []
    for v, d in zip(variables, rd):
        p = v["params"]
        weights.append([((p[f"conv1_{i}"]["kernel"], p[f"conv1_{i}"]["bias"]),
                         (p[f"conv2_{i}"]["kernel"], p[f"conv2_{i}"]["bias"]))
                        for i in range(len(d))])
    out = np.asarray(fused_mrf_blocks(
        xb, mask, weights, kernels=rk, dilations=rd, block=block, halo=halo,
        interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_mrf_pallas_packing_regimes(rng):
    """p = 128//C changes the kernel's static structure (no packing at
    C>=128, 2-way at 64); check both against the flax blocks."""
    import jax

    from stylesinger_tpu.models.hifigan import ResBlock1, _blockify
    from stylesinger_tpu.ops.mrf_pallas import fused_mrf_blocks

    for c in (64, 128):
        block = 32
        rk, rd = (3, 5), ((1, 2), (1, 3))
        halo = max(ResBlock1.halo(k, d) for k, d in zip(rk, rd))
        x = jnp.asarray(rng.standard_normal((2, 70, c)).astype(np.float32))
        xb, mask, t = _blockify(x, block, halo)
        key = jax.random.PRNGKey(c)
        blocks = [ResBlock1(c, k, d) for k, d in zip(rk, rd)]
        variables = [b.init(key, xb, mask) for b in blocks]
        ref = sum(np.asarray(b.apply(v, xb, mask))
                  for b, v in zip(blocks, variables)) / len(blocks)
        ref = ref[:, halo:halo + block]
        weights = []
        for v, d in zip(variables, rd):
            p = v["params"]
            weights.append(
                [((p[f"conv1_{i}"]["kernel"], p[f"conv1_{i}"]["bias"]),
                  (p[f"conv2_{i}"]["kernel"], p[f"conv2_{i}"]["bias"]))
                 for i in range(len(d))])
        out = np.asarray(fused_mrf_blocks(
            xb, mask, weights, kernels=rk, dilations=rd, block=block,
            halo=halo, interpret=True))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_mrf_pallas_bf16_precision(rng):
    """bf16 kernel error vs the f32 path must stay in the same band as
    the flax bf16 path's own rounding error (the kernel accumulates
    matmuls in f32, so it should never be worse)."""
    import jax

    from stylesinger_tpu.models.hifigan import ResBlock1, _blockify
    from stylesinger_tpu.ops.mrf_pallas import fused_mrf_blocks

    c, block = 16, 64
    rk, rd = (3, 7, 11), ((1, 3, 5),) * 3
    halo = max(ResBlock1.halo(k, d) for k, d in zip(rk, rd))
    x = jnp.asarray(rng.standard_normal((1, 150, c)).astype(np.float32) * .1)
    xb, mask, t = _blockify(x, block, halo)
    key = jax.random.PRNGKey(0)
    blocks32 = [ResBlock1(c, k, d) for k, d in zip(rk, rd)]
    blocks16 = [ResBlock1(c, k, d, dtype=jnp.bfloat16)
                for k, d in zip(rk, rd)]
    variables = [b.init(key, xb, mask) for b in blocks32]
    ref32 = sum(np.asarray(b.apply(v, xb, mask))
                for b, v in zip(blocks32, variables)) / 3
    ref16 = sum(np.asarray(
        b.apply(v, xb.astype(jnp.bfloat16),
                mask.astype(jnp.bfloat16)).astype(jnp.float32))
        for b, v in zip(blocks16, variables)) / 3
    weights = []
    for v, d in zip(variables, rd):
        p = v["params"]
        weights.append(
            [((p[f"conv1_{i}"]["kernel"], p[f"conv1_{i}"]["bias"]),
              (p[f"conv2_{i}"]["kernel"], p[f"conv2_{i}"]["bias"]))
             for i in range(len(d))])
    out16 = np.asarray(fused_mrf_blocks(
        xb, mask, weights, kernels=rk, dilations=rd, block=block, halo=halo,
        compute_dtype=jnp.bfloat16, interpret=True)).astype(np.float32)
    s = slice(halo, halo + block)
    d_pallas = np.abs(out16 - ref32[:, s]).max()
    d_flax = np.abs(ref16[:, s] - ref32[:, s]).max()
    assert d_pallas < max(4 * d_flax, 0.05), (d_pallas, d_flax)
