"""Golden-value parity tests against the mounted PyTorch reference.

Builds the reference torch modules with fixed seeds, converts their weights
with ``vibravox_tpu.models.convert``, and checks the flax forward passes
reproduce the torch outputs to float32 tolerance.  Skipped when the
reference repo or torch is unavailable.
"""

import importlib.machinery
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
        # a spec-less module breaks any later find_spec("torchaudio") in the
        # same process (test-order sensitivity); give the stub a real spec
        ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
        tat.__spec__ = importlib.machinery.ModuleSpec("torchaudio.transforms", None)
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


def _torch_stft_mag(x, fft, hop, win, eps=1e-8):
    """auraloss STFTLoss.stft: torch.stft(center=True, reflect) magnitudes
    with the power clamped at eps (auraloss/freq.py)."""
    window = torch.hann_window(win)
    spec = torch.stft(x, fft, hop, win, window, return_complex=True)
    return torch.sqrt(torch.clamp(spec.real**2 + spec.imag**2, min=eps))


def _aw_taps(fs: int, ntaps: int = 101) -> np.ndarray:
    """auraloss FIRFilter('aw'): IEC 1672 analog A-weighting -> bilinear ->
    least-squares FIR fit on the 512-point freqz grid (perceptual.py)."""
    import scipy.signal as sps

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    num = [(2 * np.pi * f4) ** 2 * 10 ** (1.9997 / 20), 0, 0, 0, 0]
    den = np.polymul([1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
                     [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2])
    den = np.polymul(np.polymul(den, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = sps.bilinear(num, den, fs=fs)
    w, h = sps.freqz(b, a, worN=512, fs=fs)
    return sps.firls(ntaps, w, np.abs(h), fs=fs).astype(np.float32)


def _torch_mrstft_loss(x, y, sample_rate=16000, perceptual=True):
    """torch twin of auraloss.freq.MultiResolutionSTFTLoss with the
    reference's multi_stft.yaml configuration (SC + log-mag, A-weighting)."""
    if perceptual:
        taps = torch.from_numpy(_aw_taps(sample_rate))[None, None]
        x = torch.nn.functional.conv1d(x[:, None], taps, padding=50)[:, 0]
        y = torch.nn.functional.conv1d(y[:, None], taps, padding=50)[:, 0]
    total = 0.0
    for fft, hop, win in ((512, 50, 240), (1024, 120, 600), (2048, 240, 1200)):
        xm, ym = _torch_stft_mag(x, fft, hop, win), _torch_stft_mag(y, fft, hop, win)
        sc = torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro")
        logm = torch.nn.functional.l1_loss(torch.log(xm), torch.log(ym))
        total = total + sc + logm
    return total / 3


class TestSTFTMagnitudeParity:
    """stft_magnitude vs torch.stft — pins the training objective's framing,
    windowing and magnitude semantics to what auraloss computes."""

    @pytest.mark.parametrize("fft,hop,win", [(512, 50, 240), (1024, 120, 600), (2048, 240, 1200)])
    def test_matches_torch_stft(self, fft, hop, win):
        import jax.numpy as jnp

        from vibravox_tpu.ops.stft import stft_magnitude

        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 16000)).astype(np.float32)
        ours = np.asarray(stft_magnitude(jnp.asarray(x), fft, hop, win))
        theirs = _torch_stft_mag(torch.from_numpy(x), fft, hop, win).numpy()
        theirs = np.transpose(theirs, (0, 2, 1))  # (B, bins, frames) -> (B, frames, bins)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)

    def test_aw_taps_match_auraloss_recipe(self):
        from vibravox_tpu.ops.stft import a_weighting_fir

        np.testing.assert_allclose(a_weighting_fir(16000), _aw_taps(16000), atol=1e-7)

    def test_mrstft_loss_matches_torch_twin(self):
        import jax.numpy as jnp

        from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss

        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
        y = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
        ours = MultiResolutionSTFTLoss(
            (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
            sample_rate=16000, perceptual_weighting=True,
        )(jnp.asarray(x), jnp.asarray(y))
        theirs = _torch_mrstft_loss(torch.from_numpy(x), torch.from_numpy(y))
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)


@requires_reference
class TestBalancingLambdaParity:
    """Dynamic-loss-balancing lambdas vs the reference's
    torch.autograd.grad(L_i, last_conv.weight) (eben.py:223-240) on converted
    weights — the highest-risk math in the repo (tail-only jacrev trick)."""

    def test_lambdas_match_torch_autograd(self):
        import jax
        import jax.numpy as jnp
        import optax

        from vibravox.torch_modules.dnn.eben_generator import EBENGenerator as TorchEBEN
        from vibravox.torch_modules.dnn.eben_discriminator import (
            DiscriminatorEBENMultiScales as TorchDisc,
        )
        from vibravox.torch_modules.losses.feature_loss import (
            FeatureLossForDiscriminatorMelganMultiScales,
        )
        from vibravox.torch_modules.losses.hinge_loss import (
            HingeLossForDiscriminatorMelganMultiScales,
        )

        from vibravox_tpu.losses.gan import FeatureMatchingLoss, HingeLoss
        from vibravox_tpu.models.convert import (
            eben_discriminator_params_from_torch,
            eben_generator_params_from_torch,
        )
        from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
        from vibravox_tpu.models.eben_generator import EBENGenerator
        from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss
        from vibravox_tpu.tasks.eben import EBENTask
        from vibravox_tpu.tasks.eben_oracle import balancing_lambdas_naive

        torch.manual_seed(7)
        tg = TorchEBEN(m=4, n=32, p=2)
        td = TorchDisc(q=4, min_channels=24)
        x = torch.randn(2, 1, 8000) * 0.1
        ref = torch.randn(2, 1, 8000) * 0.1
        x = tg.cut_to_valid_length(x)
        ref = tg.cut_to_valid_length(ref)

        # ---- torch lambdas (reference dynamically_balance_losses) ----
        enhanced, decomposed = tg(x)
        dec_ref = tg.pqmf(ref, "analysis")
        atomic = {}
        atomic["reconstructive_loss_freq"] = _torch_mrstft_loss(
            enhanced[:, 0], ref[:, 0], perceptual=True
        )
        emb_enh = td(bands=decomposed, audio=enhanced)
        emb_ref = td(bands=dec_ref, audio=ref)
        atomic["feature_matching_loss"] = FeatureLossForDiscriminatorMelganMultiScales()(
            emb_enh, emb_ref
        )
        atomic["adv_loss_gen"] = HingeLossForDiscriminatorMelganMultiScales()(emb_enh, target=1)
        torch_norms = [
            torch.norm(torch.autograd.grad(l, tg.last_conv.weight, retain_graph=True)[0])
            .detach().item()
            for l in atomic.values()
        ]
        torch_lambdas = [min(max(1 / (n + 1e-4), 0.0), 1e4) for n in torch_norms]

        # ---- jax lambdas (eben_oracle.balancing_lambdas_naive) ----
        gen = EBENGenerator(m=4, n=32, p=2)
        disc = DiscriminatorEBENMultiScales(q=4, min_channels=24)
        task = EBENTask(
            sample_rate=16000,
            generator=gen,
            discriminator=disc,
            generator_optimizer=optax.adam(1e-4),
            discriminator_optimizer=optax.adam(1e-4),
            reconstructive_loss_freq_fn=MultiResolutionSTFTLoss(
                (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
                sample_rate=16000, perceptual_weighting=True,
            ),
            feature_matching_loss_fn=FeatureMatchingLoss(),
            adversarial_loss_fn=HingeLoss(),
            dynamic_loss_balancing="simple",
        )
        gen_params = eben_generator_params_from_torch(
            {k: v.detach().numpy() for k, v in tg.state_dict().items()}
        )
        disc_params = eben_discriminator_params_from_torch(
            {k: v.detach().numpy() for k, v in td.state_dict().items()}
        )
        xj = jnp.asarray(_to_nwc(x.numpy()))
        refj = jnp.asarray(_to_nwc(ref.numpy()))
        state = task.init_state(jax.random.key(0), {
            "audio_body_conducted": xj, "audio_airborne": refj,
        })
        state = state.replace(gen_params=gen_params, disc_params=disc_params)
        features, first_bands = gen.apply(gen_params, xj, method="front")
        dec_ref_j = gen.pqmf.analysis(refj)
        lambdas, norms = balancing_lambdas_naive(task, state, features, first_bands, refj, dec_ref_j)
        np.testing.assert_allclose(np.asarray(norms), torch_norms, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(lambdas), torch_lambdas, rtol=2e-3)
