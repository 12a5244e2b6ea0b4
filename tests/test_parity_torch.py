"""Golden-value parity tests against the mounted PyTorch reference.

Builds the reference torch modules with fixed seeds, converts their weights
with ``vibravox_tpu.models.convert``, and checks the flax forward passes
reproduce the torch outputs to float32 tolerance.  Skipped when the
reference repo or torch is unavailable.
"""

import sys
import types

import numpy as np
import pytest

from tests.conftest import requires_reference

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module", autouse=True)
def _reference_on_path():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # torchaudio is not installed; stub the single symbol the discriminator
    # module imports (only used by MelganMultiScalesDiscriminator).
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")

        class _Resample:  # pragma: no cover
            def __init__(self, *a, **k):
                raise RuntimeError("torchaudio stub")

        tat.Resample = _Resample
        ta.transforms = tat
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat
    yield


def _to_nwc(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 2, 1))


@requires_reference
class TestEBENGeneratorParity:
    @pytest.fixture(scope="class")
    def torch_fixture(self):
        from vibravox.torch_modules.dnn.eben_generator import EBENGenerator as TorchEBEN

        torch.manual_seed(0)
        tg = TorchEBEN(m=4, n=32, p=2)
        x = torch.randn(2, 1, 39904)
        with torch.no_grad():
            enh, dec = tg(x)
        sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
        return sd, x.numpy(), enh.numpy(), dec.numpy()

    def test_pqmf_bank_parity(self, torch_fixture):
        from vibravox_tpu.ops.pqmf import design_pqmf_bank

        sd, *_ = torch_fixture
        a, s = design_pqmf_bank(4, 32, 9.0)
        np.testing.assert_allclose(a, sd["pqmf.analysis_weights"][:, 0, :], atol=1e-5)
        np.testing.assert_allclose(s, sd["pqmf.synthesis_weights"][:, 0, :], atol=1e-5)

    def test_forward_parity(self, torch_fixture):
        import jax.numpy as jnp

        from vibravox_tpu.models.convert import (
            eben_generator_params_from_torch,
            infer_eben_hparams_from_torch,
        )
        from vibravox_tpu.models.eben_generator import EBENGenerator

        sd, x, enh, dec = torch_fixture
        hp = infer_eben_hparams_from_torch(sd)
        assert hp == {"m": 4, "n": 32, "p": 2}
        gen = EBENGenerator(**hp)
        params = eben_generator_params_from_torch(sd)
        our_enh, our_dec = gen.apply(params, jnp.asarray(_to_nwc(x)))
        np.testing.assert_allclose(np.asarray(our_enh), _to_nwc(enh), atol=1e-5)
        np.testing.assert_allclose(np.asarray(our_dec), _to_nwc(dec), atol=1e-5)


@requires_reference
class TestEBENDiscriminatorParity:
    def test_forward_parity(self):
        import jax.numpy as jnp

        from vibravox.torch_modules.dnn.eben_discriminator import (
            DiscriminatorEBENMultiScales as TorchDisc,
        )

        from vibravox_tpu.models.convert import eben_discriminator_params_from_torch
        from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales

        torch.manual_seed(1)
        td = TorchDisc(q=4, min_channels=24)
        bands = torch.randn(2, 4, 2496)
        audio = torch.randn(2, 1, 9984)
        with torch.no_grad():
            ref_emb = td(bands=bands, audio=audio)
        sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}

        disc = DiscriminatorEBENMultiScales(q=4, min_channels=24)
        params = eben_discriminator_params_from_torch(sd)
        emb = disc.apply(params, jnp.asarray(_to_nwc(bands.numpy())), jnp.asarray(_to_nwc(audio.numpy())))
        assert len(emb) == len(ref_emb)
        for ours_scale, ref_scale in zip(emb, ref_emb):
            assert len(ours_scale) == len(ref_scale)
            for ours, ref in zip(ours_scale, ref_scale):
                np.testing.assert_allclose(
                    np.asarray(ours), _to_nwc(ref.numpy()), atol=2e-5
                )


@requires_reference
class TestLossParity:
    def test_hinge_and_feature_losses(self):
        import jax.numpy as jnp

        from vibravox.torch_modules.losses.feature_loss import (
            FeatureLossForDiscriminatorMelganMultiScales,
        )
        from vibravox.torch_modules.losses.hinge_loss import (
            HingeLossForDiscriminatorMelganMultiScales,
        )

        from vibravox_tpu.losses.gan import feature_matching_loss, hinge_loss

        torch.manual_seed(2)
        emb_a = [[torch.randn(2, 8, 50) for _ in range(5)] for _ in range(3)]
        emb_b = [[torch.randn(2, 8, 50) for _ in range(5)] for _ in range(3)]
        ref_hinge = HingeLossForDiscriminatorMelganMultiScales()(emb_a, target=1)
        ref_feat = FeatureLossForDiscriminatorMelganMultiScales()(emb_a, emb_b)

        ja = [[jnp.asarray(_to_nwc(t.numpy())) for t in scale] for scale in emb_a]
        jb = [[jnp.asarray(_to_nwc(t.numpy())) for t in scale] for scale in emb_b]
        np.testing.assert_allclose(float(hinge_loss(ja, 1)), float(ref_hinge), rtol=1e-5)
        np.testing.assert_allclose(float(feature_matching_loss(ja, jb)), float(ref_feat), rtol=1e-5)
