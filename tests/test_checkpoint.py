"""Checkpoint subsystem: native save/load roundtrip, converter strictness."""

import numpy as np
import pytest

import jax

from omnivggt_tpu.config import tiny_test_config
from omnivggt_tpu.models.omnivggt import OmniVGGT
from tests.reference_util import (
    install_reference,
    reference_available,
    torch_state_dict_to_numpy,
)


def test_save_and_from_pretrained_roundtrip(tmp_path):
    model = OmniVGGT(tiny_test_config(), seed=3)
    model.save_pretrained(str(tmp_path / "ckpt"))
    loaded = OmniVGGT.from_pretrained(str(tmp_path / "ckpt"))
    assert loaded.config == model.config
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # loaded model actually runs
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(1, 2, 28, 28, 3)).astype(np.float32)
    p1 = model(imgs)
    p2 = loaded(imgs)
    np.testing.assert_allclose(
        np.asarray(p1["pose_enc"]), np.asarray(p2["pose_enc"]), atol=1e-6
    )


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_converter_strictness():
    """Missing or extra tensors must fail loudly (the analogue of the
    reference's strict=True load, inference.py:324)."""
    install_reference()
    import torch

    from omnivggt_tpu.checkpoint import convert_state_dict
    from tests.test_models import _tiny_cfg, _tiny_torch_omnivggt

    torch.manual_seed(0)
    model_t = _tiny_torch_omnivggt(torch)
    sd = torch_state_dict_to_numpy(model_t)
    cfg = _tiny_cfg()

    convert_state_dict(dict(sd), cfg)  # baseline: converts cleanly

    missing = dict(sd)
    missing.pop("camera_head.embed_pose.weight")
    with pytest.raises(KeyError, match="embed_pose"):
        convert_state_dict(missing, cfg)

    extra = dict(sd)
    extra["rogue.tensor"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_state_dict(extra, cfg)


def test_safetensors_roundtrip(tmp_path):
    """A reference-layout safetensors file loads through the public
    from_safetensors entry point."""
    if not reference_available():
        pytest.skip("reference tree not mounted")
    install_reference()
    import torch
    from safetensors.numpy import save_file

    from tests.test_models import _tiny_cfg, _tiny_torch_omnivggt

    torch.manual_seed(1)
    model_t = _tiny_torch_omnivggt(torch)
    sd = torch_state_dict_to_numpy(model_t)
    path = str(tmp_path / "ref.safetensors")
    save_file(sd, path)

    # pin fp32 heads: this test checks strict reference parity, not the
    # certified bf16-head serving default
    model = OmniVGGT.from_safetensors(path, _tiny_cfg(), head_dtype="float32")
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(2, 28, 28, 3)).astype(np.float32)
    preds = model(imgs)
    with torch.no_grad():
        ref = model_t(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.zeros(1, 2, 3, 4), torch.zeros(1, 2, 3, 3),
            torch.zeros(1, 2, 28, 28, 1), torch.zeros(1, 2, 28, 28),
            depth_gt_index=[], camera_gt_index=[],
        )
    np.testing.assert_allclose(
        ref["pose_enc"].numpy(), np.asarray(preds["pose_enc"]), atol=5e-4
    )

def test_certify_head_dtype():
    """The bf16-head certification probe enables bf16 heads when the probe
    deltas stay in tolerance and keeps fp32 when they do not."""
    from omnivggt_tpu.models.omnivggt import certify_head_dtype

    cfg = tiny_test_config()
    model = OmniVGGT(cfg, seed=0)

    certified = certify_head_dtype(model.params, cfg)
    assert certified.head_dtype == "bfloat16"
    # everything else unchanged
    assert certified.aggregator == cfg.aggregator

    # zero tolerance: bf16 rounding alone must fail the gate -> fp32 kept
    strict = certify_head_dtype(model.params, cfg, pose_tol=0.0, rel_tol=0.0)
    assert strict.head_dtype == "float32"

    # explicit non-fp32 configs pass through untouched
    import dataclasses

    forced = dataclasses.replace(cfg, head_dtype="bfloat16")
    assert certify_head_dtype(model.params, forced) is forced


def test_from_safetensors_head_dtype_modes(tmp_path):
    """head_dtype='auto' certifies-then-defaults bf16 heads at load;
    'float32' forces the reference-parity mode."""
    if not reference_available():
        pytest.skip("reference tree not mounted")
    install_reference()
    import torch
    from safetensors.numpy import save_file

    from tests.test_models import _tiny_cfg, _tiny_torch_omnivggt

    torch.manual_seed(2)
    sd = torch_state_dict_to_numpy(_tiny_torch_omnivggt(torch))
    path = str(tmp_path / "ref.safetensors")
    save_file(sd, path)

    auto = OmniVGGT.from_safetensors(path, _tiny_cfg())
    assert auto.config.head_dtype == "bfloat16"
    assert auto.config.approx_gelu  # full fast mode certified
    forced = OmniVGGT.from_safetensors(path, _tiny_cfg(), head_dtype="float32")
    assert forced.config.head_dtype == "float32"
    assert not forced.config.approx_gelu


def test_from_pretrained_hub_path_clear_error():
    """A repo-id argument that cannot be fetched (offline image) degrades to
    an actionable error pointing at from_safetensors, not a FileNotFoundError
    about config.json."""
    with pytest.raises(RuntimeError, match="from_safetensors"):
        OmniVGGT.from_pretrained("someorg/OmniVGGT")


def test_from_pretrained_typod_local_path_not_hub():
    """Only a plausible 'org/name' id routes to the hub: a typo'd local
    path (absolute, or with multiple slashes) must raise the local
    file-not-found error rather than attempt a network download."""
    for bad in ("/no/such/dir", "some/nested/path", "./relative/dir"):
        with pytest.raises(FileNotFoundError):
            OmniVGGT.from_pretrained(bad)


def test_certify_fast_modes_ladder():
    """certify_fast_modes defaults the most aggressive passing mode (bf16
    heads + tanh GELU), and walks down the ladder as gates tighten."""
    import dataclasses

    from omnivggt_tpu.models.omnivggt import certify_fast_modes

    cfg = tiny_test_config()
    model = OmniVGGT(cfg, seed=0)

    best = certify_fast_modes(model.params, cfg)
    assert best.head_dtype == "bfloat16" and best.approx_gelu

    # gates loose enough for 8-bit quantisation noise admit the W8A8 rung
    # (on tiny random weights the default 2e-2 gate may legitimately reject
    # int8 — the ladder then falls back, as asserted above)
    loose = certify_fast_modes(model.params, cfg, pose_tol=0.2, rel_tol=0.2)
    assert loose.trunk_quant == "int8" and loose.head_dtype == "bfloat16"
    # ... and the int8 trunk rung carries the head_quant upgrade probe
    # (W8A8 DPT-head convs — only worth it on that rung, see config.py)
    assert loose.head_quant == "int8"

    # zero tolerance: every fast mode fails -> reference-parity config kept
    strict = certify_fast_modes(model.params, cfg, pose_tol=0.0, rel_tol=0.0)
    assert strict.head_dtype == "float32" and not strict.approx_gelu
    assert strict.trunk_quant == "none"

    # caller-chosen configs pass through untouched
    forced = dataclasses.replace(cfg, approx_gelu=True)
    assert certify_fast_modes(model.params, forced) is forced
    forced_q = dataclasses.replace(cfg, trunk_quant="int8")
    assert certify_fast_modes(model.params, forced_q) is forced_q
    forced_ln = dataclasses.replace(cfg, trunk_quant="int8_ln")
    assert certify_fast_modes(model.params, forced_ln) is forced_ln
    forced_attn = dataclasses.replace(cfg, attn_quant="int8")
    assert certify_fast_modes(model.params, forced_attn) is forced_attn
    forced_hq = dataclasses.replace(cfg, head_quant="int8")
    assert certify_fast_modes(model.params, forced_hq) is forced_hq

    # the attn_quant upgrade probe runs on whatever rung wins; on this CPU
    # test backend the flash kernel never dispatches, so the probe deltas
    # are exactly zero and the upgrade certifies trivially
    assert best.attn_quant == "int8"
    assert strict.attn_quant == "int8"


def test_approx_gelu_close_to_exact():
    """The tanh-GELU trunk stays within the certification gates of the exact
    form on a tiny model (the property the load-time probe checks)."""
    import dataclasses

    import jax.numpy as jnp

    from omnivggt_tpu.models import omnivggt as M

    cfg = tiny_test_config()
    model = OmniVGGT(cfg, seed=1)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(1, 2, 28, 28, 3)).astype(np.float32))

    exact = M.apply(model.params, imgs, cfg)
    approx = M.apply(
        model.params, imgs, dataclasses.replace(cfg, approx_gelu=True)
    )
    d = float(np.max(np.abs(np.asarray(exact["pose_enc"]) - np.asarray(approx["pose_enc"]))))
    assert d < 2e-2, d


def test_int8_trunk_close_to_fp32():
    """The W8A8 trunk's pose deltas stay at the 8-bit quantisation level on
    a tiny model (a few percent; the load-time probe decides per-checkpoint
    whether that clears the serving gate), and training refuses the
    quantised config (round() kills the gradient)."""
    import dataclasses

    import jax.numpy as jnp

    from omnivggt_tpu.models import omnivggt as M

    cfg = tiny_test_config()
    model = OmniVGGT(cfg, seed=1)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(1, 2, 28, 28, 3)).astype(np.float32))

    exact = M.apply(model.params, imgs, cfg)
    quant = M.apply(
        model.params, imgs, dataclasses.replace(cfg, trunk_quant="int8")
    )
    d = float(np.max(np.abs(np.asarray(exact["pose_enc"]) - np.asarray(quant["pose_enc"]))))
    assert 0 < d < 1e-1, d

    # the partial rung (qkv/fc1 only, LayerNorm-fed inputs) also stays at
    # the quantisation-noise level; on the flagship it measures ~0.6x the
    # full-int8 pose delta (0.036 vs 0.060 random init) — tiny models are
    # too seed-noisy to assert the ordering, only the bound
    half = M.apply(
        model.params, imgs, dataclasses.replace(cfg, trunk_quant="int8_ln")
    )
    d_ln = float(np.max(np.abs(np.asarray(exact["pose_enc"]) - np.asarray(half["pose_enc"]))))
    assert 0 < d_ln < 1e-1, d_ln

    import optax

    from omnivggt_tpu.train.step import make_train_step

    with pytest.raises(ValueError, match="serving-only"):
        make_train_step(
            dataclasses.replace(cfg, trunk_quant="int8"), optax.sgd(1e-3)
        )
    with pytest.raises(ValueError, match="serving-only"):
        make_train_step(
            dataclasses.replace(cfg, attn_quant="int8"), optax.sgd(1e-3)
        )

    with pytest.raises(ValueError, match="trunk_quant"):
        dataclasses.replace(cfg, trunk_quant="int4")
    with pytest.raises(ValueError, match="attn_quant"):
        dataclasses.replace(cfg, attn_quant="int4")


def test_int8_head_convs_close_to_fp32():
    """head_quant='int8' (W8A8 DPT convs) stays at the 8-bit noise level on
    the dense outputs, leaves pose_enc untouched (the camera head is not
    quantised), and is refused by the train step."""
    import dataclasses

    import jax.numpy as jnp
    import optax

    from omnivggt_tpu.models import omnivggt as M
    from omnivggt_tpu.train.step import make_train_step

    cfg = tiny_test_config()
    model = OmniVGGT(cfg, seed=1)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(1, 2, 28, 28, 3)).astype(np.float32))

    exact = M.apply(model.params, imgs, cfg)
    quant = M.apply(
        model.params, imgs, dataclasses.replace(cfg, head_quant="int8")
    )
    np.testing.assert_array_equal(
        np.asarray(exact["pose_enc"]), np.asarray(quant["pose_enc"])
    )
    d_ref = np.asarray(exact["depth"])
    d = np.median(
        np.abs(d_ref - np.asarray(quant["depth"])) / (np.abs(d_ref) + 1e-3)
    )
    assert 0 < d < 5e-2, d
    assert np.isfinite(np.asarray(quant["world_points"])).all()

    with pytest.raises(ValueError, match="serving-only"):
        make_train_step(
            dataclasses.replace(cfg, head_quant="int8"), optax.sgd(1e-3)
        )
    with pytest.raises(ValueError, match="head_quant"):
        dataclasses.replace(cfg, head_quant="int4")


def test_certificate_roundtrip_and_invalidation(tmp_path, monkeypatch):
    """from_pretrained(head_dtype='auto') persists the fast-mode verdict
    next to the checkpoint; a second load restores it WITHOUT running any
    probe forwards, and touching the checkpoint contents invalidates it."""
    import os

    from omnivggt_tpu import certification as C
    from omnivggt_tpu.models import omnivggt as M

    model = OmniVGGT(tiny_test_config(), seed=0)
    ckpt = str(tmp_path / "ckpt")
    model.save_pretrained(ckpt)

    first = OmniVGGT.from_pretrained(ckpt, head_dtype="auto")
    cert_path = C.certificate_path(ckpt)
    assert os.path.exists(cert_path)
    assert first.config.head_dtype == "bfloat16"  # ladder ran and won a rung

    # second load: the cached verdict must satisfy the ladder — no probes
    real_probe = M._probe_outputs

    def boom(*a, **k):
        raise AssertionError("probe forward ran despite a valid certificate")

    monkeypatch.setattr(M, "_probe_outputs", boom)
    second = OmniVGGT.from_pretrained(ckpt, head_dtype="auto")
    assert second.config == first.config

    # changing the checkpoint contents (new file in the manifest) must
    # invalidate the certificate and re-run the ladder
    with open(os.path.join(ckpt, "extra.txt"), "w") as f:
        f.write("drift")
    calls = []

    def counting_probe(*a, **k):
        calls.append(1)
        return real_probe(*a, **k)

    monkeypatch.setattr(M, "_probe_outputs", counting_probe)
    third = OmniVGGT.from_pretrained(ckpt, head_dtype="auto")
    assert calls, "ladder did not re-run after checkpoint contents changed"
    assert third.config == first.config


def test_certificate_module_file_semantics(tmp_path):
    """certification.load_certificate honours fingerprint, gates, and base-
    mode identity for plain checkpoint files."""
    import dataclasses

    from omnivggt_tpu import certification as C
    from omnivggt_tpu.models.omnivggt import certification_gates

    ckpt = str(tmp_path / "weights.safetensors")
    with open(ckpt, "wb") as f:
        f.write(b"\x00" * 4096)

    cfg = tiny_test_config()
    certified = dataclasses.replace(
        cfg, head_dtype="bfloat16", approx_gelu=True, trunk_quant="int8",
        attn_quant="int8",
    )
    gates = certification_gates()
    assert C.save_certificate(ckpt, cfg, certified, gates) is not None

    got = C.load_certificate(ckpt, cfg, gates)
    assert got == certified

    # different gates -> no verdict
    assert C.load_certificate(ckpt, cfg, certification_gates(pose_tol=1e-3)) is None
    # different base modes (caller forcing fp32 heads must not inherit)
    forced = dataclasses.replace(cfg, trunk_quant="int8")
    assert C.load_certificate(ckpt, forced, gates) is None
    # content drift -> no verdict
    with open(ckpt, "ab") as f:
        f.write(b"\x01")
    assert C.load_certificate(ckpt, cfg, gates) is None
    # corrupt certificate file -> None, not a crash
    with open(C.certificate_path(ckpt), "w") as f:
        f.write("{not json")
    assert C.load_certificate(ckpt, cfg, gates) is None


def test_certify_final_gate_steps_down(monkeypatch):
    """A rung that passes the cheap ladder probe but fails at the serving-
    representative final resolution steps down the ladder, with the lower
    rungs re-gated at the final resolution (VERDICT r3 item 3)."""
    from omnivggt_tpu.models import omnivggt as M

    cfg = tiny_test_config(img_size=56)
    base = {
        "pose_enc": np.zeros((1, 2, 9), np.float32),
        "depth": np.ones((1, 2, 4, 4, 1), np.float32),
        "world_points": np.ones((1, 2, 4, 4, 3), np.float32),
        "depth_conf": np.ones((1, 2, 4, 4), np.float32),
    }
    probes = []

    def fake_probe(params, c, hw, s):
        probes.append((c.trunk_quant, c.approx_gelu, c.attn_quant, hw))
        out = {k: v.copy() for k, v in base.items()}
        # int8 looks fine at the small ladder probe but breaks at the
        # final resolution; int8_ln is always broken; tanh rung is clean
        if c.trunk_quant == "int8" and hw > 28:
            out["pose_enc"] = out["pose_enc"] + 1.0
        if c.trunk_quant == "int8_ln":
            out["pose_enc"] = out["pose_enc"] + 1.0
        return out

    monkeypatch.setattr(M, "_probe_outputs", fake_probe)
    best = M.certify_fast_modes(None, cfg, probe_hw=28, final_hw=56)
    # int8 won the ladder at 28 px, failed the 56 px final gate; int8_ln
    # failed too; the tanh rung passed at 56 px and took the attn upgrade
    assert best.trunk_quant == "none"
    assert best.approx_gelu and best.head_dtype == "bfloat16"
    assert best.attn_quant == "int8"
    # the final stage re-gated at 56 px (not a repeat of the 28 px gate)
    assert ("int8", True, "none", 56) in probes
    assert ("none", True, "int8", 56) in probes
