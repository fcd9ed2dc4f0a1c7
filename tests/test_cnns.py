"""CNN encoder tests: shapes, and golden-value parity of the converted
conv/BN stack against an equivalent torch model (generic torch code, not the
reference's — validates the OIHW->HWIO / BN-stat conversion conventions)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from zs_aac_tpu.models.cnns import Cnn10, Cnn14, ResNet38
from zs_aac_tpu.models.convert import convert_cnn


class _TorchConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.relu(self.bn2(self.conv2(x)))
        return tF.avg_pool2d(x, 2)


class _TorchMiniCnn(tnn.Module):
    """Same computation as zs_aac_tpu Cnn14 with reduced channels."""

    def __init__(self, channels):
        super().__init__()
        self.bn0 = tnn.BatchNorm2d(16)  # over mel bins
        cin = 1
        for i, c in enumerate(channels):
            setattr(self, f"conv_block{i + 1}", _TorchConvBlock(cin, c))
            cin = c
        self.channels = channels

    def forward(self, spec):  # spec: [B, 1, T, F]
        x = spec.transpose(1, 3)
        x = self.bn0(x)
        x = x.transpose(1, 3)
        for i in range(len(self.channels)):
            x = getattr(self, f"conv_block{i + 1}")(x)
        x = torch.mean(x, dim=3)
        return torch.max(x, dim=2)[0] + torch.mean(x, dim=2)


def _randomize_bn_stats(m):
    rng = np.random.default_rng(3)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.data = torch.tensor(
                rng.standard_normal(mod.num_features), dtype=torch.float32
            )
            mod.running_var.data = torch.tensor(
                rng.uniform(0.5, 2.0, mod.num_features), dtype=torch.float32
            )


def test_cnn_stack_matches_torch_golden():
    channels = (8, 16)
    tm = _TorchMiniCnn(channels).eval()
    _randomize_bn_stats(tm)

    spec = np.random.default_rng(0).standard_normal((2, 24, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(spec)[:, None]).numpy()

    model = Cnn14(channels=channels, spec_augmentation=False)
    variables = convert_cnn(tm.state_dict(), n_blocks=len(channels))
    got = np.asarray(model.apply(variables, jnp.asarray(spec), train=False))

    assert got.shape == want.shape == (2, channels[-1])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cnn14_shapes_and_train_mode():
    model = Cnn14(spec_augmentation=True)
    spec = jnp.zeros((2, 128, 64))
    variables = model.init(
        {"params": jax.random.key(0)}, spec, train=False
    )
    out = model.apply(variables, spec, train=False)
    assert out.shape == (2, 2048)

    out2, mutated = model.apply(
        variables,
        jnp.ones((2, 128, 64)),
        train=True,
        rngs={"specaug": jax.random.key(1), "dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert out2.shape == (2, 2048)
    assert "batch_stats" in mutated


def test_cnn10_and_resnet38_shapes():
    spec = jnp.zeros((1, 128, 64))
    m10 = Cnn10(spec_augmentation=False)
    v10 = m10.init({"params": jax.random.key(0)}, spec, train=False)
    assert m10.apply(v10, spec, train=False).shape == (1, 512)

    r38 = ResNet38(spec_augmentation=False)
    v38 = r38.init({"params": jax.random.key(0)}, spec, train=False)
    assert r38.apply(v38, spec, train=False).shape == (1, 2048)
