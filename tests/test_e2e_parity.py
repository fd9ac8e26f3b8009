"""End-to-end tiny-flagship numeric parity: a synthetic Lightning .ckpt +
tokenizer.pth through `load_tokenhmr_checkpoint` -> `forward_step`, against
a hand-built torch replica of the WHOLE graph (ViT backbone + decoder +
classifier + frozen PoseVQ decode + IEF), VERDICT r1 weak #5.

This exercises the exact assembly path a user of the released checkpoints
takes (the checkpoints themselves are registration-gated)."""
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from test_convert import (
    TestHeadConverter, TestPoseVQConverter, TestViTConverter,
    _torch_token_classifier,
)
from tokenhmr_tpu.models import posevq as PQ
from tokenhmr_tpu.models.token_head import TokenHeadConfig
from tokenhmr_tpu.models.transformer import DecoderConfig
from tokenhmr_tpu.models.vit import ViTConfig


def _torch_vit_forward(sd, x_np, cfg: ViTConfig):
    """Reference ViT math at arbitrary depth (extends the single-block
    replica in test_convert.py; ref vit.py:300-345)."""
    w = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    tx = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    feat = torch.nn.functional.conv2d(
        tx, w["patch_embed.proj.weight"], w["patch_embed.proj.bias"],
        stride=cfg.patch_size, padding=4)
    B, D, Hp, Wp = feat.shape
    t = feat.flatten(2).transpose(1, 2)
    pos = w["pos_embed"]
    t = t + pos[:, 1:] + pos[:, :1]
    ln = lambda v, wk, bk: torch.nn.functional.layer_norm(
        v, (D,), w[wk], w[bk], eps=1e-6)
    H = cfg.num_heads
    hd = D // H
    for i in range(cfg.depth):
        P = f"blocks.{i}"
        h = ln(t, f"{P}.norm1.weight", f"{P}.norm1.bias")
        qkv = h @ w[f"{P}.attn.qkv.weight"].T + w[f"{P}.attn.qkv.bias"]
        q, k, v = qkv.reshape(B, -1, 3, H, hd).permute(2, 0, 3, 1, 4)
        attn = torch.softmax(q @ k.transpose(-2, -1) * hd ** -0.5, -1)
        o = (attn @ v).transpose(1, 2).reshape(B, -1, D)
        o = o @ w[f"{P}.attn.proj.weight"].T + w[f"{P}.attn.proj.bias"]
        t = t + o
        h = ln(t, f"{P}.norm2.weight", f"{P}.norm2.bias")
        h = torch.nn.functional.gelu(
            h @ w[f"{P}.mlp.fc1.weight"].T + w[f"{P}.mlp.fc1.bias"])
        h = h @ w[f"{P}.mlp.fc2.weight"].T + w[f"{P}.mlp.fc2.bias"]
        t = t + h
    return ln(t, "last_norm.weight", "last_norm.bias")


class TestEndToEndCheckpointParity:
    def test_full_graph_matches_torch(self, tmp_path):
        # --- consistent tiny architecture --------------------------------
        pq_cfg = PQ.PoseVQConfig(code_dim=16, nb_code=32, width=24, depth=2)
        vit_cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=2,
                            num_heads=2, dtype=jnp.float32,
                            drop_path_rate=0.0, attn_impl="xla",
                            gelu_approx=False)
        dec = DecoderConfig(dim=32, depth=2, heads=2, dim_head=8, mlp_dim=32,
                            context_dim=vit_cfg.embed_dim)
        head_cfg = TokenHeadConfig(
            token_num=pq_cfg.num_tokens, token_class_num=pq_cfg.nb_code,
            decoder=dec, hidden_dim=4, hidden_inter_dim=8, token_inter_dim=4)

        # --- synthesize the artifacts the release pipeline ships ----------
        vit_sd = TestViTConverter()._torch_vit_sd(vit_cfg, seed=11)
        head_sd = TestHeadConverter()._torch_head_sd(head_cfg, seed=12)
        full_sd = {f"backbone.{k}": torch.from_numpy(np.asarray(v))
                   for k, v in vit_sd.items()}
        full_sd.update({f"smpl_head.{k}": torch.from_numpy(np.asarray(v))
                        for k, v in head_sd.items()})
        ckpt_path = str(tmp_path / "model.ckpt")
        torch.save({"state_dict": full_sd}, ckpt_path)

        pq_sd = TestPoseVQConverter()._torch_posevq_sd(pq_cfg, seed=13)
        arch = types.SimpleNamespace(
            CODE_DIM=pq_cfg.code_dim, NB_CODE=pq_cfg.nb_code,
            WIDTH=pq_cfg.width, DEPTH=pq_cfg.depth,
            DILATION_RATE=pq_cfg.dilation_growth_rate, DOWN_T=pq_cfg.down_t,
            TOKEN_SIZE_MUL=pq_cfg.token_size_mul,
            TOKEN_SIZE_DIV=pq_cfg.token_size_div)
        net = {}
        for k, v in pq_sd.items():
            if k == "codebook":
                net["quantizer.codebook"] = torch.from_numpy(np.asarray(v))
            elif k.startswith("encoder."):
                net["encoder." + k] = torch.from_numpy(np.asarray(v))
            else:
                net["decoder." + k] = torch.from_numpy(np.asarray(v))
        tok_path = str(tmp_path / "tokenizer.pth")
        torch.save({"net": net,
                    "hparams": types.SimpleNamespace(ARCH=arch)}, tok_path)

        # --- OUR assembly path --------------------------------------------
        from tokenhmr_tpu.convert.load import load_tokenhmr_checkpoint
        from tokenhmr_tpu.models import smpl as S
        from tokenhmr_tpu.models.tokenhmr import forward_step

        cfg, params, frozen, mean_params = load_tokenhmr_checkpoint(
            ckpt_path, tokenizer_path=tok_path,
            vit_cfg=vit_cfg, head_cfg=head_cfg)
        smpl_model = S.synthetic_smpl_model(num_vertices=400, num_joints=24)
        x = np.random.RandomState(3).randn(2, 64, 48, 3).astype(np.float32)
        out = forward_step(params, frozen, cfg, smpl_model, jnp.asarray(x),
                           mean_params=mean_params)

        # --- torch replica of the whole graph ------------------------------
        feats = _torch_vit_forward(vit_sd, x, vit_cfg)
        w = {k: torch.from_numpy(np.asarray(v)) for k, v in head_sd.items()}
        pw = {k: torch.from_numpy(np.asarray(v)) for k, v in pq_sd.items()}
        B = 2

        def lin(v, key, bias=True):
            o = v @ w[f"{key}.weight"].T
            return o + w[f"{key}.bias"] if bias else o

        def lnf(v, key):
            return torch.nn.functional.layer_norm(
                v, (v.shape[-1],), w[f"{key}.weight"], w[f"{key}.bias"])

        def attn(q, k, v, H, Dh):
            Bq, N = q.shape[:2]
            T = k.shape[1]
            q = q.reshape(Bq, N, H, Dh).permute(0, 2, 1, 3)
            k = k.reshape(Bq, T, H, Dh).permute(0, 2, 1, 3)
            v = v.reshape(Bq, T, H, Dh).permute(0, 2, 1, 3)
            a = torch.softmax(q @ k.transpose(-1, -2) * Dh ** -0.5, -1)
            return (a @ v).permute(0, 2, 1, 3).reshape(Bq, N, H * Dh)

        xq = lin(torch.zeros(B, 1, 1), "transformer.to_token_embedding")
        xq = xq + w["transformer.pos_embedding"]
        for i in range(dec.depth):
            L = f"transformer.transformer.layers.{i}"
            h = lnf(xq, f"{L}.0.norm")
            q, k, v = lin(h, f"{L}.0.fn.to_qkv", bias=False).chunk(3, -1)
            xq = xq + lin(attn(q, k, v, dec.heads, dec.dim_head),
                          f"{L}.0.fn.to_out.0")
            h = lnf(xq, f"{L}.1.norm")
            k, v = lin(feats, f"{L}.1.fn.to_kv", bias=False).chunk(2, -1)
            q = lin(h, f"{L}.1.fn.to_q", bias=False)
            xq = xq + lin(attn(q, k, v, dec.heads, dec.dim_head),
                          f"{L}.1.fn.to_out.0")
            h = lnf(xq, f"{L}.2.norm")
            h = torch.nn.functional.gelu(lin(h, f"{L}.2.fn.net.0"))
            xq = xq + lin(h, f"{L}.2.fn.net.3")
        tok = xq[:, 0]

        simplex = _torch_token_classifier(tok, w, head_cfg)
        z = simplex @ torch.from_numpy(np.asarray(pq_sd["codebook"]))
        # frozen PoseVQ decode (replica from test_convert, inlined here)
        tz = z.permute(0, 2, 1)
        c1d = lambda v, p, s=1, pad=1, dil=1: torch.nn.functional.conv1d(
            v, pw[f"{p}.weight"], pw[f"{p}.bias"], stride=s, padding=pad,
            dilation=dil)
        relu = torch.nn.functional.relu
        d = relu(c1d(tz, "decoder.0"))
        sizes = list(np.linspace(21, pq_cfg.num_tokens, pq_cfg.token_size_div,
                                 endpoint=False, dtype=int)[::-1])
        idx = 2
        for s_ in sizes:
            d = torch.nn.functional.interpolate(d, size=int(s_), mode="nearest")
            d = relu(c1d(d, f"decoder.{idx + 1}"))
            idx += 3
        dil = [pq_cfg.dilation_growth_rate ** k
               for k in range(pq_cfg.depth)][::-1]
        for j, dd in enumerate(dil):
            res = d
            h2 = relu(d)
            h2 = c1d(h2, f"decoder.{idx}.0.model.{j}.conv1", pad=dd, dil=dd)
            h2 = relu(h2)
            h2 = c1d(h2, f"decoder.{idx}.0.model.{j}.conv2", pad=0)
            d = res + h2
        d = c1d(d, f"decoder.{idx}.1")
        d = c1d(d, f"decoder.{idx + 1}")
        bpose = d.permute(0, 2, 1).reshape(B, -1)

        grot = lin(tok, "decpose_grot")
        hands = lin(tok, "decpose_hands")
        pred_pose = torch.cat([grot, bpose, hands], -1) + \
            w["init_body_pose"].expand(B, -1)
        pred_betas = lin(tok, "decshape") + w["init_betas"].expand(B, -1)
        pred_cam = lin(tok, "deccam") + w["init_cam"].expand(B, -1)

        np.testing.assert_allclose(np.asarray(out["pred_cam"]),
                                   pred_cam.numpy(), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(out["pred_smpl_params"]["betas"]),
            pred_betas.numpy(), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(out["cls_logits_softmax"]), simplex.numpy(), atol=5e-4)
        from tokenhmr_tpu.ops.rotations import rotation_6d_to_matrix
        rot_ref = np.asarray(rotation_6d_to_matrix(
            jnp.asarray(pred_pose.numpy().reshape(B, 24, 6))))
        got = np.concatenate(
            [np.asarray(out["pred_smpl_params"]["global_orient"]),
             np.asarray(out["pred_smpl_params"]["body_pose"])], axis=1)
        np.testing.assert_allclose(got, rot_ref, atol=2e-3)
