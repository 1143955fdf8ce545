"""Se3TrackNet tests: shapes, determinism, and numerical parity against an
independently-built PyTorch module implementing the documented reference
architecture (se3_tracknet.py:52-121 spec)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.models import torch_import

RES = 176


@pytest.fixture(scope="module")
def model_and_vars():
    model = tracknet.create_model(RES)
    variables = tracknet.init_variables(model, jax.random.PRNGKey(0))
    return model, variables


def test_output_shapes(model_and_vars):
    model, variables = model_and_vars
    A = jnp.zeros((2, RES, RES, 4))
    B = jnp.zeros((2, RES, RES, 4))
    out = model.apply(variables, A, B, train=False)
    assert out["trans"].shape == (2, 3)
    assert out["rot"].shape == (2, 3)
    assert out["feature"].shape == (2, 22, 22, 256)
    assert np.all(np.abs(np.array(out["trans"])) <= 1.0)
    assert np.all(np.abs(np.array(out["rot"])) <= 1.0)


def test_loss():
    total, parts = tracknet.loss_fn(
        jnp.ones((4, 3)) * 0.5, jnp.zeros((4, 3)),
        jnp.zeros((4, 3)), jnp.ones((4, 3)) * 0.1,
    )
    np.testing.assert_allclose(float(parts["trans"]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(parts["rot"]), 0.01, atol=1e-6)
    np.testing.assert_allclose(float(total), 0.26, atol=1e-6)


def _build_torch_model():
    """Reference-spec torch model (built from the documented architecture,
    SURVEY.md C2) used purely as a numerical oracle in tests."""
    import torch
    import torch.nn as nn

    def conv_bn_selu(cin, cout, k, s):
        return nn.Sequential(
            nn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=True),
            nn.BatchNorm2d(cout),
            nn.SELU(inplace=True),
        )

    class Res(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1, bias=True)
            self.bn1 = nn.BatchNorm2d(ch)
            self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=True)
            self.bn2 = nn.BatchNorm2d(ch)
            self.relu = nn.ReLU()

        def forward(self, x):
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + x)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.convA1 = conv_bn_selu(4, 64, 7, 2)
            self.poolA1 = nn.MaxPool2d(3, 2, 1)
            self.convA2 = Res(64)
            self.convB1 = conv_bn_selu(4, 64, 7, 2)
            self.poolB1 = nn.MaxPool2d(3, 2, 1)
            self.convB2 = Res(64)
            self.convB3 = Res(64)
            self.convAB1 = conv_bn_selu(128, 256, 3, 2)
            self.convAB2 = Res(256)
            self.trans_conv1 = conv_bn_selu(256, 512, 3, 2)
            self.trans_conv2 = Res(512)
            self.trans_out = nn.Sequential(nn.Linear(512, 3), nn.Tanh())
            self.rot_conv1 = conv_bn_selu(256, 512, 3, 2)
            self.rot_conv2 = Res(512)
            self.rot_out = nn.Sequential(nn.Linear(512, 3), nn.Tanh())

        def forward(self, A, B):
            a = self.convA2(self.poolA1(self.convA1(A)))
            b = self.convB3(self.convB2(self.poolB1(self.convB1(B))))
            ab = torch.cat([a, b], dim=1)
            ab = self.convAB2(self.convAB1(ab))
            t = self.trans_conv2(self.trans_conv1(ab)).mean(dim=(2, 3))
            r = self.rot_conv2(self.rot_conv1(ab)).mean(dim=(2, 3))
            return self.trans_out(t), self.rot_out(r)

    return Net()


def test_torch_parity():
    """Import random torch weights; outputs must match within f32 tolerance."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    tnet = _build_torch_model().eval()
    # Randomize BN stats so the import path of running_mean/var is exercised.
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    variables = torch_import.state_dict_to_variables(tnet.state_dict())

    rng = np.random.RandomState(0)
    A = rng.randn(2, 4, RES, RES).astype(np.float32)
    B = rng.randn(2, 4, RES, RES).astype(np.float32)

    with torch.no_grad():
        t_t, t_r = tnet(torch.from_numpy(A), torch.from_numpy(B))

    model = tracknet.create_model(RES)
    out = model.apply(
        variables,
        jnp.transpose(jnp.array(A), (0, 2, 3, 1)),
        jnp.transpose(jnp.array(B), (0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.array(out["trans"]), t_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.array(out["rot"]), t_r.numpy(), atol=2e-5)


def test_state_dict_roundtrip():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    tnet = _build_torch_model()
    sd = tnet.state_dict()
    variables = torch_import.state_dict_to_variables(sd)
    sd2 = torch_import.variables_to_state_dict(variables)
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_allclose(sd2[k], v.numpy(), atol=1e-7, err_msg=k)


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    A = jnp.array(np.random.RandomState(0).randn(2, RES, RES, 4), jnp.float32)
    out, mutated = model.apply(
        variables, A, A, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["convA1"]["bn"]["mean"]
    after = mutated["batch_stats"]["convA1"]["bn"]["mean"]
    assert not np.allclose(np.array(before), np.array(after))
