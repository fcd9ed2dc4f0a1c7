"""HTSAT tests: bicubic-resize golden vs torch, swin plumbing, converter."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from zs_aac_tpu.models.htsat import (
    HTSAT,
    _shift_attn_mask,
    _window_partition,
    _window_reverse,
    bicubic_resize_matrix,
)

TINY = dict(
    spec_size=64, patch_stride=4, patch_size=4, embed_dim=16,
    depths=(2, 2), num_heads=(2, 4), window_size=4, n_mels=16,
    spec_augmentation=False, drop_path_rate=0.0,
)


def test_bicubic_matrix_matches_torch_align_corners():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 101, 16)).astype(np.float32)
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x), (256, 16), mode="bicubic", align_corners=True
        )
        .numpy()
    )
    m = bicubic_resize_matrix(101, 256)
    got = np.einsum("bctf,to->bcof", x, m)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    w = _window_partition(x, 4)
    assert w.shape == (2 * 16, 16, 8)
    back = _window_reverse(w, 4, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_structure():
    m = _shift_attn_mask(16, 16, 4, 2)
    assert m.shape == (16, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert _shift_attn_mask(16, 16, 4, 0) is None


def test_htsat_tiny_forward_and_dict():
    model = HTSAT(**TINY)
    # freq_ratio = 64/16 = 4; input T <= 64*4 = 256, F <= 16.
    spec = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 100, 16)).astype(np.float32)
    )
    v = model.init({"params": jax.random.key(0)}, spec, train=False, return_dict=True)
    emb = model.apply(v, spec, train=False)
    assert emb.shape == (2, 16 * 2)  # embed_dim * 2^(stages-1)
    out = model.apply(v, spec, train=False, return_dict=True)
    assert out["clipwise_output"].shape == (2, 527)
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()
    assert out["embedding"].shape == (2, 32)
    # train mode with drop path + specaug
    model2 = HTSAT(**{**TINY, "spec_augmentation": True, "drop_path_rate": 0.1})
    v2 = model2.init({"params": jax.random.key(0)}, spec, train=False)
    out2, mut = model2.apply(
        v2, spec, train=True,
        rngs={"specaug": jax.random.key(1), "dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert out2.shape == (2, 32)


def test_convert_htsat_structural():
    """Synthetic PANNs/WavCaps-style state dict -> all shapes line up."""
    depths = TINY["depths"]
    ed = TINY["embed_dim"]
    heads = TINY["num_heads"]
    w = TINY["window_size"]
    sd = {}

    def ln(prefix, d):
        sd[f"{prefix}.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(d, np.float32)

    sd["bn0.weight"] = np.ones(16, np.float32)
    sd["bn0.bias"] = np.zeros(16, np.float32)
    sd["bn0.running_mean"] = np.zeros(16, np.float32)
    sd["bn0.running_var"] = np.ones(16, np.float32)
    sd["patch_embed.proj.weight"] = np.zeros((ed, 1, 4, 4), np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(ed, np.float32)
    ln("patch_embed.norm", ed)
    for i, depth in enumerate(depths):
        dim = ed * 2**i
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            ln(f"{p}.norm1", dim)
            ln(f"{p}.norm2", dim)
            sd[f"{p}.attn.qkv.weight"] = np.zeros((3 * dim, dim), np.float32)
            sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
            sd[f"{p}.attn.proj.weight"] = np.zeros((dim, dim), np.float32)
            sd[f"{p}.attn.proj.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = np.zeros(
                ((2 * w - 1) ** 2, heads[i]), np.float32
            )
            sd[f"{p}.mlp.fc1.weight"] = np.zeros((4 * dim, dim), np.float32)
            sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"{p}.mlp.fc2.weight"] = np.zeros((dim, 4 * dim), np.float32)
            sd[f"{p}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if i < len(depths) - 1:
            ln(f"layers.{i}.downsample.norm", 4 * dim)
            sd[f"layers.{i}.downsample.reduction.weight"] = np.zeros(
                (2 * dim, 4 * dim), np.float32
            )
    nf = ed * 2 ** (len(depths) - 1)
    ln("norm", nf)
    # tscam kernel (c_freq_bin, 3): tiny model -> SF = 64/2/4 = 8, fr=4 -> c=2
    sd["tscam_conv.weight"] = np.zeros((527, nf, 2, 3), np.float32)
    sd["tscam_conv.bias"] = np.zeros(527, np.float32)

    from zs_aac_tpu.models.convert import convert_htsat

    variables = convert_htsat(sd, depths=depths)

    model = HTSAT(**TINY)
    spec = jnp.zeros((1, 100, 16))
    ref = model.init({"params": jax.random.key(0)}, spec, train=False,
                     return_dict=True)
    # every converted leaf must match the init-tree structure and shapes
    ref_flat = jax.tree_util.tree_leaves_with_path(ref["params"])
    got_flat = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    for path, leaf in ref_flat:
        assert path in got_flat, f"missing converted param {path}"
        assert got_flat[path].shape == leaf.shape, f"shape mismatch at {path}"
    out = model.apply(variables, spec, train=False, return_dict=True)
    assert out["embedding"].shape == (1, nf)
