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


def test_swin_block_golden_vs_torch():
    """Golden-activation test of one shifted Swin block (SURVEY.md §9's
    'mandatory per-stage golden tests' for HTSAT fidelity): a generic torch
    implementation of windowed attention with relative position bias and
    the shifted-window mask, numerically compared against _SwinBlock with
    converted weights."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    dim, heads, window, shift = 16, 4, 4, 2
    H = W = 8
    rng = np.random.default_rng(0)

    class TorchSwinBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim)
            self.qkv = tnn.Linear(dim, dim * 3)
            self.proj = tnn.Linear(dim, dim)
            self.rpb = tnn.Parameter(
                torch.randn((2 * window - 1) ** 2, heads) * 0.02)
            self.norm2 = tnn.LayerNorm(dim)
            self.fc1 = tnn.Linear(dim, dim * 4)
            self.fc2 = tnn.Linear(dim * 4, dim)
            # relative position index (standard swin)
            coords = torch.stack(torch.meshgrid(
                torch.arange(window), torch.arange(window), indexing="ij"))
            flat = torch.flatten(coords, 1)
            rel = flat[:, :, None] - flat[:, None, :]
            rel = rel.permute(1, 2, 0).contiguous()
            rel[:, :, 0] += window - 1
            rel[:, :, 1] += window - 1
            rel[:, :, 0] *= 2 * window - 1
            self.register_buffer("rpi", rel.sum(-1))
            # shifted-window attention mask
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img.view(1, H // window, window, W // window, window, 1)
            mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
            am = mw.unsqueeze(1) - mw.unsqueeze(2)
            self.register_buffer(
                "attn_mask",
                am.masked_fill(am != 0, float(-100.0)).masked_fill(am == 0, 0.0))

        def forward(self, x):  # x: [B, H*W, C]
            B, L, C = x.shape
            shortcut = x
            h = self.norm1(x).view(B, H, W, C)
            h = torch.roll(h, (-shift, -shift), dims=(1, 2))
            hw = h.view(B, H // window, window, W // window, window, C)
            hw = hw.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)
            B_, N, _ = hw.shape
            qkv = self.qkv(hw).reshape(B_, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
            bias = self.rpb[self.rpi.view(-1)].view(N, N, heads).permute(2, 0, 1)
            att = att + bias.unsqueeze(0)
            nW = self.attn_mask.shape[0]
            att = att.view(B_ // nW, nW, heads, N, N) + self.attn_mask.unsqueeze(1).unsqueeze(0)
            att = att.view(-1, heads, N, N).softmax(-1)
            out = (att @ v).transpose(1, 2).reshape(B_, N, C)
            out = self.proj(out)
            out = out.view(B, H // window, W // window, window, window, C)
            out = out.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
            out = torch.roll(out, (shift, shift), dims=(1, 2)).view(B, L, C)
            x = shortcut + out
            return x + self.fc2(tF.gelu(self.fc1(self.norm2(x))))

    torch.manual_seed(0)
    tm = TorchSwinBlock().eval()
    x = rng.standard_normal((2, H * W, dim)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    from flax.traverse_util import unflatten_dict
    from zs_aac_tpu.models.convert import linear_kernel
    from zs_aac_tpu.models.htsat import _SwinBlock

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = unflatten_dict({
        ("norm1", "scale"): sd["norm1.weight"],
        ("norm1", "bias"): sd["norm1.bias"],
        ("attn", "qkv", "kernel"): linear_kernel(sd["qkv.weight"]),
        ("attn", "qkv", "bias"): sd["qkv.bias"],
        ("attn", "proj", "kernel"): linear_kernel(sd["proj.weight"]),
        ("attn", "proj", "bias"): sd["proj.bias"],
        ("attn", "rpb_table"): sd["rpb"],
        ("norm2", "scale"): sd["norm2.weight"],
        ("norm2", "bias"): sd["norm2.bias"],
        ("fc1", "kernel"): linear_kernel(sd["fc1.weight"]),
        ("fc1", "bias"): sd["fc1.bias"],
        ("fc2", "kernel"): linear_kernel(sd["fc2.weight"]),
        ("fc2", "bias"): sd["fc2.bias"],
    })
    blk = _SwinBlock(dim=dim, input_resolution=(H, W), num_heads=heads,
                     window=window, shift=shift, mlp_ratio=4.0, drop_path=0.0)
    got = np.asarray(blk.apply({"params": params}, jnp.asarray(x), False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_window_attention_matches_xla():
    """The Pallas fused window-attention path must match the XLA
    roll/partition/attend/reverse path through the full HTSAT trunk
    (same params — the fused flag changes no param paths)."""
    import jax.numpy as jnp

    from zs_aac_tpu.models.htsat import HTSAT

    kw = dict(spec_size=64, patch_stride=4, patch_size=4, embed_dim=32,
              depths=(2, 2), num_heads=(2, 4), window_size=4, n_mels=16)
    ref = HTSAT(**kw)
    fused = HTSAT(fused_attn=True, **kw)

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((2, 251, 16)).astype(np.float32))
    variables = jax.jit(lambda r, s: ref.init({"params": r}, s, train=False))(
        jax.random.key(0), spec
    )
    # identical param trees (the fused path defines the same params)
    v2 = jax.jit(lambda r, s: fused.init({"params": r}, s, train=False))(
        jax.random.key(0), spec
    )
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    out_ref = jax.jit(lambda v, s: ref.apply(v, s, train=False))(variables, spec)
    out_fused = jax.jit(lambda v, s: fused.apply(v, s, train=False))(variables, spec)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_window_attention_grad_matches_xla():
    """The fused kernel's custom_vjp must produce the XLA path's gradients
    (VERDICT r2 #5): same loss, grads w.r.t. ALL params (incl. rpb_table
    through build_window_bias) and the input spec, on shifted + unshifted
    stages."""
    import jax.numpy as jnp

    from zs_aac_tpu.models.htsat import HTSAT

    kw = dict(spec_size=64, patch_stride=4, patch_size=4, embed_dim=32,
              depths=(2, 2), num_heads=(2, 4), window_size=4, n_mels=16)
    ref = HTSAT(**kw)
    fused = HTSAT(fused_attn=True, **kw)

    rng = np.random.default_rng(3)
    spec = jnp.asarray(rng.standard_normal((2, 251, 16)).astype(np.float32))
    variables = jax.jit(lambda r, s: ref.init({"params": r}, s, train=False))(
        jax.random.key(1), spec
    )
    cot = jnp.asarray(rng.standard_normal((2, 768 // 24 * kw["embed_dim"]))
                      .astype(np.float32))

    def loss(model):
        def f(params, s):
            out = model.apply({"params": params,
                               **{k: v for k, v in variables.items()
                                  if k != "params"}}, s, train=False)
            return jnp.sum(out * cot[:, : out.shape[-1]])
        return f

    g_ref = jax.jit(jax.grad(loss(ref), argnums=(0, 1)))(
        variables["params"], spec
    )
    g_fused = jax.jit(jax.grad(loss(fused), argnums=(0, 1)))(
        variables["params"], spec
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_window_attention_pallas_bwd_direct():
    """The Pallas backward kernel (``_bwd_kernel``) must produce the
    analytic grads of the kernel math — checked directly against the
    linearized pure-jnp twin at an HTSAT-stage-like shape (engages the
    kernel; interpret mode on CPU) and at a stage-4-class shape where
    ``_pick_rows_bwd`` returns None and ``_fwa_bwd`` must fall back to the
    twin vjp."""
    import functools

    import jax.numpy as jnp

    from zs_aac_tpu.ops.window_attn import (
        _fwa_bwd,
        _pick_rows_bwd,
        _reference_window_attention,
        build_window_bias,
    )

    def case(H, W, C, h, shift, window=8):
        nH, nW, N = H // window, W // window, window * window
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32) * 0.1)
        qkv_w = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.05)
        qkv_b = jnp.asarray(rng.standard_normal((3 * C,)).astype(np.float32) * 0.01)
        proj_w = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.05)
        proj_b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.01)
        rpb = jnp.asarray(rng.standard_normal((h, N, N)).astype(np.float32) * 0.1)
        bias = build_window_bias(rpb, None, nH, nW)
        g = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
        res = (x, qkv_w, qkv_b, proj_w, proj_b, bias)

        got = _fwa_bwd(window, h, shift, res, g)
        f = functools.partial(_reference_window_attention, window=window,
                              num_heads=h, shift=shift)
        _, vjp = jax.vjp(f, *res)
        want = vjp(g)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    # stage-0-like (Pallas kernel engaged: f32 itemsize, C=96 fits)
    assert _pick_rows_bwd(2, 2, 64, 96, 4, 4) is not None
    case(16, 16, 96, 4, shift=0)
    case(16, 16, 96, 4, shift=4)
    # stage-4-class: must gate to the twin-vjp fallback
    assert _pick_rows_bwd(1, 1, 64, 768, 32, 4) is None
    case(8, 8, 768, 32, shift=0)


def test_fused_swin_block_matches_xla():
    """The whole-block Pallas kernel (LN1/attn/residual/LN2/MLP/residual
    VMEM-resident, ``ops/window_attn.py::fused_swin_block``) must match the
    layered nn.LayerNorm/nn.Dense eval path through the full trunk, with an
    interchangeable param tree (the fused path declares the same params via
    _LNParams/_LinParams). Tolerance covers the kernel's fp32 LN statistics
    and A&S-erf gelu vs the layered path's bf16-free fp32 chain."""
    import jax.numpy as jnp

    from zs_aac_tpu.models.htsat import HTSAT

    kw = dict(spec_size=64, patch_stride=4, patch_size=4, embed_dim=32,
              depths=(2, 2), num_heads=(2, 4), window_size=4, n_mels=16)
    ref = HTSAT(**kw)
    fused = HTSAT(fused_attn=True, fused_block=True, **kw)

    rng = np.random.default_rng(7)
    spec = jnp.asarray(rng.standard_normal((2, 251, 16)).astype(np.float32))
    variables = jax.jit(lambda r, s: ref.init({"params": r}, s, train=False))(
        jax.random.key(0), spec
    )
    v2 = jax.jit(lambda r, s: fused.init({"params": r}, s, train=False))(
        jax.random.key(0), spec
    )
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    out_ref = jax.jit(lambda v, s: ref.apply(v, s, train=False))(variables, spec)
    out_fused = jax.jit(lambda v, s: fused.apply(v, s, train=False))(variables, spec)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)

    # train mode must keep using the layered path (drop_path/rng semantics):
    # apply with train=True under the fused config and the ref params
    out_tr = fused.apply(
        variables, spec, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2), "specaug": jax.random.key(3)},
    )[0]
    assert np.isfinite(np.asarray(out_tr)).all()


def test_fused_swin_block_streamed_matches_twin():
    """The MLP-streamed whole-block kernel (round 4: stage-4 shapes whose
    MLP weights exceed the VMEM-resident budget stream them in hidden-dim
    chunks) must match the pure-jnp twin. Two shapes: (a) a multi-row
    SHIFTED block with an oversized MLP in fp32 (tight tolerance — the
    only reduction-order difference is the chunked f32 fc2 accumulator);
    (b) HTSAT stage 4's exact eval shape (C=768, hidden=3072, heads=32,
    8x8 res, window 8) in bf16, the serving dtype."""
    from zs_aac_tpu.ops.window_attn import (
        _pick_rows_block,
        _pick_stream_block,
        _reference_swin_block,
        fused_swin_block,
    )

    def run(B, H, W, C, hidden, heads, window, shift, dtype, seed):
        w = window
        nH, nW, N = H // w, W // w, w * w
        itemsize = jnp.dtype(dtype).itemsize
        assert _pick_rows_block(nH, nW, N, C, heads, hidden, itemsize) is None
        assert _pick_stream_block(nH, nW, N, C, heads, hidden,
                                  itemsize) is not None
        rng = np.random.default_rng(seed)
        f = lambda *s: jnp.asarray(
            (rng.standard_normal(s) * 0.05).astype(np.float32), dtype)
        ones = lambda n: jnp.asarray(
            1.0 + 0.05 * rng.standard_normal(n).astype(np.float32), dtype)
        x = f(B, H, W, C)
        args = (x, ones(C), f(C), f(C, 3 * C), f(3 * C), f(C, C), f(C),
                ones(C), f(C), f(C, hidden), f(hidden), f(hidden, C), f(C),
                jnp.asarray(rng.standard_normal(
                    (nH, nW, heads, N, N)).astype(np.float32)))
        out = fused_swin_block(*args, w, heads, shift, 1e-6)
        ref = _reference_swin_block(*args, window=w, num_heads=heads,
                                    shift=shift, eps=1e-6)
        return np.asarray(out, np.float32), np.asarray(ref, np.float32)

    out, ref = run(2, 16, 16, 128, 8192, 4, 8, 4, jnp.float32, 3)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    # bf16: the twin upcasts the MLP dots to fp32 while the kernel feeds
    # the MXU bf16 operands (f32 accumulation) — input-rounding noise of
    # ~2^-8 per operand accumulated through LN/attn/fc1(3072-sum)/fc2
    # bounds the agreement, not the chunking (which case (a) pins at
    # 2e-4). Outputs are O(8); 0.16 absolute ~ 2% of full scale.
    out, ref = run(2, 8, 8, 768, 3072, 32, 8, 0, jnp.bfloat16, 4)
    np.testing.assert_allclose(out, ref, rtol=0.08, atol=0.16)


def test_fused_swin_block_train_bwd_direct():
    """``fused_swin_block_train``'s split Pallas backward (MLP+LN2 kernel,
    then attention+LN1 kernel) must produce the analytic grads of the
    pure-jnp twin with NONTRIVIAL per-sample drop-path keep scales,
    shifted and unshifted (interpret mode on CPU)."""
    import functools

    import jax.numpy as jnp

    from zs_aac_tpu.ops.window_attn import (
        _pick_rows_block_train,
        _reference_swin_block_train,
        fused_swin_block_train,
    )

    def case(H, W, C, h, shift, window=8):
        hidden = 4 * C
        nH, nW, N = H // window, W // window, window * window
        assert _pick_rows_block_train(nH, nW, N, C, h, hidden, 4) is not None
        rng = np.random.default_rng(13)
        r = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.05)
        x = r(2, H, W, C)
        args = (x, r(C) + 1.0, r(C), r(C, 3 * C), r(3 * C), r(C, C), r(C),
                r(C) + 1.0, r(C), r(C, hidden), r(hidden), r(hidden, C),
                r(C))
        from zs_aac_tpu.ops.window_attn import build_window_bias
        rpb = r(h, N, N)
        bias = build_window_bias(rpb, None, nH, nW)
        # drop-path keep scales: one row kept+rescaled, one row dropped
        m1 = jnp.asarray([1.25, 0.0], jnp.float32)
        m2 = jnp.asarray([0.0, 1.25], jnp.float32)
        g = r(2, H, W, C) * 20.0

        f_fused = functools.partial(fused_swin_block_train, window=window,
                                    num_heads=h, shift=shift, eps=1e-6)
        f_twin = functools.partial(_reference_swin_block_train, window=window,
                                   num_heads=h, shift=shift, eps=1e-6)
        out_f, vjp_f = jax.vjp(f_fused, *args, bias, m1, m2)
        out_t, vjp_t = jax.vjp(f_twin, *args, bias, m1, m2)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_t),
                                   rtol=2e-4, atol=2e-5)
        got, want = vjp_f(g), vjp_t(g)
        # mask cotangents are zeros by design; skip the twin's values there
        for i, (a, b) in enumerate(zip(got[:-2], want[:-2])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"arg {i}")
        assert not np.any(np.asarray(got[-1]))
        assert not np.any(np.asarray(got[-2]))

    case(16, 16, 96, 4, shift=0)
    case(16, 16, 96, 4, shift=4)


def test_fused_swin_block_train_grad_matches_xla():
    """Model-level: HTSAT with ``fused_block`` in TRAIN mode (the
    fused_swin_block_train path — fused Pallas forward + split Pallas
    backward) must reproduce the layered XLA path's gradients. drop_path
    is zeroed so both paths are deterministic (stochastic-depth draws are
    path-specific); the nontrivial-mask algebra is covered by
    ``test_fused_swin_block_train_bwd_direct``."""
    import jax.numpy as jnp

    from zs_aac_tpu.models.htsat import HTSAT

    kw = dict(spec_size=64, patch_stride=4, patch_size=4, embed_dim=32,
              depths=(2, 2), num_heads=(2, 4), window_size=4, n_mels=16,
              drop_path_rate=0.0)
    ref = HTSAT(**kw)
    fused = HTSAT(fused_attn=True, fused_block=True, **kw)

    rng = np.random.default_rng(5)
    spec = jnp.asarray(rng.standard_normal((2, 251, 16)).astype(np.float32))
    variables = jax.jit(lambda r, s: ref.init({"params": r}, s, train=False))(
        jax.random.key(1), spec
    )

    def loss(model):
        def f(params, s):
            out, _ = model.apply(
                {"params": params,
                 **{k: v for k, v in variables.items() if k != "params"}},
                s, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(7),
                      "specaug": jax.random.key(8)})
            return jnp.sum(jnp.tanh(out))
        return f

    g_ref = jax.jit(jax.grad(loss(ref), argnums=(0, 1)))(
        variables["params"], spec
    )
    g_fused = jax.jit(jax.grad(loss(fused), argnums=(0, 1)))(
        variables["params"], spec
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_swin_block_grad_matches_xla():
    """fused_swin_block's custom_vjp (recompute via the pure-jnp twin) must
    reproduce the layered path's gradients."""
    import jax.numpy as jnp

    from zs_aac_tpu.models.htsat import HTSAT

    kw = dict(spec_size=64, patch_stride=4, patch_size=4, embed_dim=32,
              depths=(2, 2), num_heads=(2, 4), window_size=4, n_mels=16)
    ref = HTSAT(**kw)
    fused = HTSAT(fused_attn=True, fused_block=True, **kw)

    rng = np.random.default_rng(5)
    spec = jnp.asarray(rng.standard_normal((2, 251, 16)).astype(np.float32))
    variables = jax.jit(lambda r, s: ref.init({"params": r}, s, train=False))(
        jax.random.key(1), spec
    )

    def loss(model):
        def f(params, s):
            out = model.apply({"params": params,
                               **{k: v for k, v in variables.items()
                                  if k != "params"}}, s, train=False)
            return jnp.sum(jnp.tanh(out))
        return f

    g_ref = jax.jit(jax.grad(loss(ref), argnums=(0, 1)))(
        variables["params"], spec
    )
    g_fused = jax.jit(jax.grad(loss(fused), argnums=(0, 1)))(
        variables["params"], spec
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


# ---------------------------------------------------------------------------
# Numeric end-to-end golden through convert_htsat (round-4 VERDICT #1)
# ---------------------------------------------------------------------------


class _TorchWindowAttention(torch.nn.Module):
    """Reference WindowAttention (htsat.py:269-353) at generic geometry,
    with the reference's exact parameter/buffer names."""

    def __init__(self, dim, window, num_heads):
        super().__init__()
        tnn = torch.nn
        self.dim, self.window, self.num_heads = dim, window, num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, num_heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B_, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, h)
        att = att + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            att = att.view(B_ // nW, nW, h, N, N) + mask[None, :, None]
            att = att.view(B_, h, N, N)
        att = att.softmax(-1)
        out = (att @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(out)


class _TorchSwinBlock(torch.nn.Module):
    """Reference SwinTransformerBlock (htsat.py:354-476), eval mode."""

    def __init__(self, dim, res, num_heads, window, shift):
        super().__init__()
        tnn = torch.nn
        self.res, self.window, self.shift = res, window, shift
        if min(res) <= window:
            self.shift, self.window = 0, min(res)
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TorchWindowAttention(dim, self.window, num_heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        if self.shift > 0:
            H, W = res
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -self.window), slice(-self.window, -self.shift),
                       slice(-self.shift, None)):
                for ws in (slice(0, -self.window), slice(-self.window, -self.shift),
                           slice(-self.shift, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img.view(1, H // self.window, self.window, W // self.window,
                          self.window, 1)
            mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, self.window ** 2)
            am = mw.unsqueeze(1) - mw.unsqueeze(2)
            am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
            self.register_buffer("attn_mask", am)
        else:
            self.attn_mask = None

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        w = self.window
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = x.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(-1, w * w, C)
        xw = self.attn(xw, self.attn_mask)
        x = xw.view(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H, W, C)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(B, L, C)
        return x + self.mlp.fc2(
            torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class TorchHTSAT(torch.nn.Module):
    """Faithful torch twin of the reference HTSAT_Swin_Transformer
    (/root/reference/retrieval/models/htsat.py:588-958) at the TINY
    geometry, with the reference checkpoint's exact state_dict key layout
    (bn0, patch_embed.{proj,norm}, layers.{i}.blocks.{j}.*,
    layers.{i}.downsample.{norm,reduction}, norm, tscam_conv) so
    ``convert_htsat`` consumes ``state_dict()`` unchanged. Covers every
    stage the structural test could not: reshape_wav2img bicubic, patch
    embed, shifted windows with real rel-pos bias, patch merging, frequency
    regrouping and the TSCAM head — with real random numbers."""

    def __init__(self, spec_size=64, patch=4, embed_dim=16, depths=(2, 2),
                 heads=(2, 4), window=4, n_mels=16, num_classes=527):
        super().__init__()
        tnn = torch.nn
        self.spec_size, self.n_mels, self.depths = spec_size, n_mels, depths
        self.patch = patch
        self.fr = spec_size // n_mels
        self.bn0 = tnn.BatchNorm2d(n_mels)
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(1, embed_dim, patch, patch)
        self.patch_embed.norm = tnn.LayerNorm(embed_dim)
        res = (spec_size // patch, spec_size // patch)
        self.layers = tnn.ModuleList()
        for i, depth in enumerate(depths):
            dim = embed_dim * 2 ** i
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList([
                _TorchSwinBlock(dim, res, heads[i], window,
                                0 if j % 2 == 0 else window // 2)
                for j in range(depth)
            ])
            if i < len(depths) - 1:
                layer.downsample = tnn.Module()
                layer.downsample.norm = tnn.LayerNorm(4 * dim)
                layer.downsample.reduction = tnn.Linear(4 * dim, 2 * dim,
                                                        bias=False)
                res = (res[0] // 2, res[1] // 2)
            else:
                layer.downsample = None
            self.layers.append(layer)
        nf = embed_dim * 2 ** (len(depths) - 1)
        self.norm = tnn.LayerNorm(nf)
        sf = spec_size // 2 ** (len(depths) - 1) // patch // self.fr
        self.tscam_conv = tnn.Conv2d(nf, num_classes, (sf, 3), padding=(0, 1))

    def _reshape_wav2img(self, x):
        tF = torch.nn.functional
        B, C, T, F = x.shape
        target_T = self.spec_size * self.fr
        target_F = self.spec_size // self.fr
        if T < target_T:
            x = tF.interpolate(x, (target_T, x.shape[3]), mode="bicubic",
                               align_corners=True)
        if F < target_F:
            x = tF.interpolate(x, (x.shape[2], target_F), mode="bicubic",
                               align_corners=True)
        x = x.permute(0, 1, 3, 2).contiguous()   # B C F T
        x = x.reshape(B, C, x.shape[2], self.fr, x.shape[3] // self.fr)
        x = x.permute(0, 1, 3, 2, 4).contiguous()
        return x.reshape(B, C, x.shape[2] * x.shape[3], x.shape[4])

    def forward(self, spec):
        x = spec[:, None]                         # [B, 1, T, F]
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        x = self._reshape_wav2img(x)
        frames_num = x.shape[2]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for layer in self.layers:
            for blk in layer.blocks:
                x = blk(x)
            if layer.downsample is not None:
                B, L, C = x.shape
                H = W = int(L ** 0.5)
                x = x.view(B, H, W, C)
                x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                               x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
                x = x.view(B, -1, 4 * C)
                x = layer.downsample.reduction(layer.downsample.norm(x))
        x = self.norm(x)
        B, N, C = x.shape
        SF = frames_num // 2 ** (len(self.depths) - 1) // self.patch
        ST = SF
        x = x.permute(0, 2, 1).reshape(B, C, SF, ST)
        cfb = SF // self.fr
        x = x.reshape(B, C, SF // cfb, cfb, ST).permute(0, 1, 3, 2, 4)
        x = x.reshape(B, C, cfb, -1)
        fine = torch.repeat_interleave(x.mean(2).permute(0, 2, 1),
                                       8 * self.patch, dim=1)
        latent = x.flatten(2).mean(-1)
        t = self.tscam_conv(x).flatten(2)         # [B, classes, T']
        fpx = torch.repeat_interleave(torch.sigmoid(t).permute(0, 2, 1),
                                      8 * self.patch, dim=1)
        return {
            "embedding": latent,
            "fine_grained_embedding": fine,
            "framewise_output": fpx,
            "clipwise_output": torch.sigmoid(t.mean(-1)),
        }


def _randomize_torch_htsat(tm, rng):
    """Real random weights everywhere — LN/BN included — so any
    transposition or mis-grouping in the converter shows up numerically."""
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if name.endswith("bias"):
                p.copy_(torch.from_numpy(
                    rng.standard_normal(p.shape).astype(np.float32) * 0.1))
            elif p.ndim == 1:  # LN/BN scales
                p.copy_(torch.from_numpy(
                    (1.0 + 0.2 * rng.standard_normal(p.shape)).astype(np.float32)))
            else:
                p.copy_(torch.from_numpy(
                    rng.standard_normal(p.shape).astype(np.float32)
                    * (0.5 / np.sqrt(p.shape[-1]))))
        tm.bn0.running_mean.copy_(torch.from_numpy(
            rng.standard_normal(tm.n_mels).astype(np.float32) * 0.3))
        tm.bn0.running_var.copy_(torch.from_numpy(
            0.5 + rng.random(tm.n_mels).astype(np.float32)))


def test_convert_htsat_numeric_end_to_end():
    """Round-4 VERDICT #1: real random weights through the torch twin
    (reference state_dict layout) spec->outputs, converted via
    convert_htsat, must match HTSAT.__call__ on the XLA path AND the fused
    Pallas paths (fused_attn, fused_block) to fp32 golden tolerance."""
    torch.manual_seed(0)
    rng = np.random.default_rng(42)
    tm = TorchHTSAT()
    _randomize_torch_htsat(tm, rng)
    tm.eval()

    spec = rng.standard_normal((2, 100, 16)).astype(np.float32)
    with torch.no_grad():
        want = {k: v.numpy() for k, v in tm(torch.from_numpy(spec)).items()}

    from zs_aac_tpu.models.convert import convert_htsat

    variables = jax.tree.map(jnp.asarray,
                             convert_htsat(tm.state_dict(), depths=TINY["depths"]))

    for fused in ({}, {"fused_attn": True}, {"fused_attn": True,
                                             "fused_block": True}):
        model = HTSAT(**TINY, **fused)
        got = jax.jit(
            lambda v, s: model.apply(v, s, train=False, return_dict=True)
        )(variables, jnp.asarray(spec))
        np.testing.assert_allclose(
            np.asarray(got["embedding"]), want["embedding"],
            rtol=2e-4, atol=2e-4, err_msg=f"embedding {fused}")
        np.testing.assert_allclose(
            np.asarray(got["clipwise_output"]), want["clipwise_output"],
            rtol=2e-4, atol=2e-4, err_msg=f"clipwise {fused}")
        np.testing.assert_allclose(
            np.asarray(got["framewise_output"]), want["framewise_output"],
            rtol=2e-4, atol=2e-4, err_msg=f"framewise {fused}")
        np.testing.assert_allclose(
            np.asarray(got["fine_grained_embedding"]),
            want["fine_grained_embedding"],
            rtol=2e-4, atol=2e-4, err_msg=f"fine_grained {fused}")
