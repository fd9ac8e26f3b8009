"""Checkpoint-converter tests: structure round trips + numeric parity
against torch layers (torch-cpu builds the 'reference' state dicts)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from tokenhmr_tpu.convert import load as CV
from tokenhmr_tpu.models import posevq as PQ
from tokenhmr_tpu.models.token_head import TokenHeadConfig, TokenHead
from tokenhmr_tpu.models.transformer import DecoderConfig
from tokenhmr_tpu.models.vit import ViT, ViTConfig


def tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: tuple(np.asarray(x).shape), t)


class TestViTConverter:
    def _torch_vit_sd(self, cfg: ViTConfig, seed=0):
        """Build a torch-style ViT state dict with reference key names."""
        g = torch.Generator().manual_seed(seed)
        D, depth = cfg.embed_dim, cfg.depth
        H = int(D * cfg.mlp_ratio)
        sd = {
            "patch_embed.proj.weight": torch.randn(D, 3, 16, 16, generator=g) * 0.02,
            "patch_embed.proj.bias": torch.randn(D, generator=g) * 0.02,
            "pos_embed": torch.randn(1, cfg.num_patches + 1, D, generator=g) * 0.02,
            "last_norm.weight": torch.ones(D),
            "last_norm.bias": torch.zeros(D),
        }
        for i in range(depth):
            sd.update({
                f"blocks.{i}.norm1.weight": torch.ones(D),
                f"blocks.{i}.norm1.bias": torch.zeros(D),
                f"blocks.{i}.norm2.weight": torch.ones(D),
                f"blocks.{i}.norm2.bias": torch.zeros(D),
                f"blocks.{i}.attn.qkv.weight": torch.randn(3 * D, D, generator=g) * 0.02,
                f"blocks.{i}.attn.qkv.bias": torch.randn(3 * D, generator=g) * 0.02,
                f"blocks.{i}.attn.proj.weight": torch.randn(D, D, generator=g) * 0.02,
                f"blocks.{i}.attn.proj.bias": torch.randn(D, generator=g) * 0.02,
                f"blocks.{i}.mlp.fc1.weight": torch.randn(H, D, generator=g) * 0.02,
                f"blocks.{i}.mlp.fc1.bias": torch.randn(H, generator=g) * 0.02,
                f"blocks.{i}.mlp.fc2.weight": torch.randn(D, H, generator=g) * 0.02,
                f"blocks.{i}.mlp.fc2.bias": torch.randn(D, generator=g) * 0.02,
            })
        return {k: v.numpy() for k, v in sd.items()}

    def test_structure_matches_flax_init(self):
        cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=3, num_heads=2,
                        dtype=jnp.float32)
        model = ViT(cfg)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)))["params"]
        converted = CV.convert_vit_state_dict(self._torch_vit_sd(cfg), depth=3)
        assert tree_shapes(ref) == tree_shapes(converted)

    def test_numeric_parity_single_block(self):
        """Our flax ViT with converted weights == torch reference math."""
        cfg = ViTConfig(img_size=(64, 48), embed_dim=32, depth=1, num_heads=2,
                        dtype=jnp.float32, drop_path_rate=0.0)
        sd = self._torch_vit_sd(cfg)
        params = CV.convert_vit_state_dict(sd, depth=1)
        model = ViT(cfg)
        x = np.random.RandomState(0).randn(2, 64, 48, 3).astype(np.float32)
        out = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

        # torch reference forward (built from the same sd)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        w = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        feat = torch.nn.functional.conv2d(tx, w["patch_embed.proj.weight"],
                                          w["patch_embed.proj.bias"],
                                          stride=16, padding=4)
        B, D, Hp, Wp = feat.shape
        t = feat.flatten(2).transpose(1, 2)
        pos = w["pos_embed"]
        t = t + pos[:, 1:] + pos[:, :1]
        ln = lambda v, wk, bk: torch.nn.functional.layer_norm(
            v, (D,), w[wk], w[bk], eps=1e-6)
        h = ln(t, "blocks.0.norm1.weight", "blocks.0.norm1.bias")
        qkv = h @ w["blocks.0.attn.qkv.weight"].T + w["blocks.0.attn.qkv.bias"]
        q, k, v = qkv.reshape(B, -1, 3, 2, 16).permute(2, 0, 3, 1, 4)
        attn = torch.softmax(q @ k.transpose(-2, -1) * 16 ** -0.5, -1)
        o = (attn @ v).transpose(1, 2).reshape(B, -1, D)
        o = o @ w["blocks.0.attn.proj.weight"].T + w["blocks.0.attn.proj.bias"]
        t = t + o
        h = ln(t, "blocks.0.norm2.weight", "blocks.0.norm2.bias")
        h = torch.nn.functional.gelu(
            h @ w["blocks.0.mlp.fc1.weight"].T + w["blocks.0.mlp.fc1.bias"])
        h = h @ w["blocks.0.mlp.fc2.weight"].T + w["blocks.0.mlp.fc2.bias"]
        t = t + h
        t = ln(t, "last_norm.weight", "last_norm.bias")
        ref = t.numpy()
        np.testing.assert_allclose(out, ref, atol=2e-4)


class TestPoseVQConverter:
    def _torch_posevq_sd(self, cfg: PQ.PoseVQConfig, seed=0):
        """Reference Sequential key layout (vanilla_pose_vqvae.py:56-158)."""
        g = torch.Generator().manual_seed(seed)
        W, CD, JD = cfg.width, cfg.code_dim, cfg.joint_dim
        conv = lambda o, i, k=3: {
            "weight": torch.randn(o, i, k, generator=g) * 0.05,
            "bias": torch.randn(o, generator=g) * 0.05,
        }
        sd = {}

        def put(prefix, c):
            for kk, vv in c.items():
                sd[f"{prefix}.{kk}"] = vv

        def resnet(prefix):
            for j in range(cfg.depth):
                put(f"{prefix}.model.{j}.conv1", conv(W, W))
                put(f"{prefix}.model.{j}.conv2", conv(W, W, 1))

        # encoder
        idx = 0
        put(f"encoder.{idx}", conv(W, JD)); idx += 2
        idx += 1
        put(f"encoder.{idx}", conv(W, W)); idx += 2
        for _ in range(cfg.token_size_mul - 1):
            idx += 1
            put(f"encoder.{idx}", conv(W, W)); idx += 2
        for _ in range(cfg.down_t):
            put(f"encoder.{idx}.0", conv(W, W, 4))
            resnet(f"encoder.{idx}.1")
            idx += 1
        put(f"encoder.{idx}", conv(CD, W))
        # decoder
        idx = 0
        put(f"decoder.{idx}", conv(W, CD)); idx += 2
        for _ in range(cfg.token_size_div):
            idx += 1
            put(f"decoder.{idx}", conv(W, W)); idx += 2
        for _ in range(cfg.down_t):
            resnet(f"decoder.{idx}.0")
            put(f"decoder.{idx}.1", conv(W, W))
            idx += 1
        put(f"decoder.{idx}", conv(JD, W))
        sd["codebook"] = torch.randn(cfg.nb_code, cfg.code_dim, generator=g)
        return {k: v.numpy() for k, v in sd.items()}

    def test_structure_matches_flax_init(self):
        cfg = PQ.PoseVQConfig(code_dim=16, nb_code=32, width=24, depth=2)
        model = PQ.PoseVQ(cfg)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 21, 6)))["params"]
        sd = self._torch_posevq_sd(cfg)
        converted, codebook = CV.convert_posevq_state_dict(
            sd, cfg.token_size_mul, cfg.token_size_div, cfg.down_t, cfg.depth
        )
        assert tree_shapes(ref) == tree_shapes(converted["params"])
        assert codebook.shape == (32, 16)

    def test_numeric_parity_conv_stack(self):
        """Converted decoder conv weights reproduce torch conv1d outputs."""
        cfg = PQ.PoseVQConfig(code_dim=16, nb_code=32, width=24, depth=2)
        sd = self._torch_posevq_sd(cfg)
        converted, _ = CV.convert_posevq_state_dict(
            sd, cfg.token_size_mul, cfg.token_size_div, cfg.down_t, cfg.depth
        )
        model = PQ.PoseVQ(cfg)
        z = np.random.RandomState(1).randn(2, cfg.num_tokens, 16).astype(np.float32)
        out = np.asarray(model.apply(
            {"params": converted["params"]}, jnp.asarray(z),
            method=PQ.PoseVQ.decode_latents))

        # torch reference decoder
        tz = torch.from_numpy(z).permute(0, 2, 1)
        w = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        c1d = lambda x, p, s=1, pad=1, dil=1: torch.nn.functional.conv1d(
            x, w[f"{p}.weight"], w[f"{p}.bias"], stride=s, padding=pad, dilation=dil)
        relu = torch.nn.functional.relu
        x = relu(c1d(tz, "decoder.0"))
        sizes = list(np.linspace(21, cfg.num_tokens, cfg.token_size_div,
                                 endpoint=False, dtype=int)[::-1])
        idx = 2
        for s in sizes:
            x = torch.nn.functional.interpolate(x, size=int(s), mode="nearest")
            x = relu(c1d(x, f"decoder.{idx + 1}"))
            idx += 3
        # resnet (reverse dilation) + conv
        dil = [cfg.dilation_growth_rate ** d for d in range(cfg.depth)][::-1]
        for j, d in enumerate(dil):
            res = x
            h = relu(x)
            h = c1d(h, f"decoder.{idx}.0.model.{j}.conv1", pad=d, dil=d)
            h = relu(h)
            h = c1d(h, f"decoder.{idx}.0.model.{j}.conv2", pad=0)
            x = res + h
        x = c1d(x, f"decoder.{idx}.1")
        idx += 1
        x = c1d(x, f"decoder.{idx}")
        ref = x.permute(0, 2, 1).numpy()
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestHeadConverter:
    def _torch_head_sd(self, hc: TokenHeadConfig, seed=0):
        g = torch.Generator().manual_seed(seed)
        dc = hc.decoder
        inner = dc.heads * dc.dim_head
        lin = lambda o, i, b=True: (
            {"weight": torch.randn(o, i, generator=g) * 0.02}
            | ({"bias": torch.randn(o, generator=g) * 0.02} if b else {})
        )
        ln = lambda d: {"weight": torch.ones(d), "bias": torch.zeros(d)}
        sd = {}

        def put(prefix, c):
            for kk, vv in c.items():
                sd[f"{prefix}.{kk}"] = vv

        put("transformer.to_token_embedding", lin(dc.dim, dc.token_dim))
        sd["transformer.pos_embedding"] = torch.randn(1, 1, dc.dim, generator=g)
        for i in range(dc.depth):
            L = f"transformer.transformer.layers.{i}"
            put(f"{L}.0.norm", ln(dc.dim))
            put(f"{L}.0.fn.to_qkv", lin(inner * 3, dc.dim, b=False))
            put(f"{L}.0.fn.to_out.0", lin(dc.dim, inner))
            put(f"{L}.1.norm", ln(dc.dim))
            put(f"{L}.1.fn.to_kv", lin(inner * 2, dc.context_dim, b=False))
            put(f"{L}.1.fn.to_q", lin(inner, dc.dim, b=False))
            put(f"{L}.1.fn.to_out.0", lin(dc.dim, inner))
            put(f"{L}.2.norm", ln(dc.dim))
            put(f"{L}.2.fn.net.0", lin(dc.mlp_dim, dc.dim))
            put(f"{L}.2.fn.net.3", lin(dc.dim, dc.mlp_dim))
        put("decpose_grot", lin(6, dc.dim))
        put("decpose_hands", lin(12, dc.dim))
        put("decshape", lin(10, dc.dim))
        put("deccam", lin(3, dc.dim))
        put("decpose.mixer_trans.ff.0", lin(hc.token_num * hc.hidden_dim, dc.dim))
        put("decpose.mixer_trans.ff.1", ln(hc.token_num * hc.hidden_dim))
        for i in range(hc.num_mixer_blocks):
            M = f"decpose.mixer_head.{i}"
            put(f"{M}.layernorm1", ln(hc.hidden_dim))
            put(f"{M}.layernorm2", ln(hc.hidden_dim))
            put(f"{M}.MLP_token.ff.0", lin(hc.token_inter_dim, hc.token_num))
            put(f"{M}.MLP_token.ff.3", lin(hc.token_num, hc.token_inter_dim))
            put(f"{M}.MLP_channel.ff.0", lin(hc.hidden_inter_dim, hc.hidden_dim))
            put(f"{M}.MLP_channel.ff.3", lin(hc.hidden_dim, hc.hidden_inter_dim))
        put("decpose.mixer_norm_layer.ff.0", lin(hc.hidden_dim, hc.hidden_dim))
        put("decpose.mixer_norm_layer.ff.1", ln(hc.hidden_dim))
        put("decpose.class_pred_layer", lin(hc.token_class_num, hc.hidden_dim))
        sd["init_body_pose"] = torch.zeros(1, 144)
        sd["init_betas"] = torch.zeros(1, 10)
        sd["init_cam"] = torch.tensor([[0.9, 0.0, 0.0]])
        return {k: v.numpy() for k, v in sd.items()}

    def test_structure_matches_flax_init(self):
        dec = DecoderConfig(dim=32, depth=2, heads=2, dim_head=8, mlp_dim=32,
                            context_dim=48)
        hc = TokenHeadConfig(token_num=160, token_class_num=32, decoder=dec,
                             hidden_dim=8, hidden_inter_dim=16, token_inter_dim=8)
        head = TokenHead(hc, decode_tokens=lambda l: jnp.zeros(
            (l.shape[0], 21, 6)))
        ref = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 48)))["params"]
        converted, init = CV.convert_token_head_state_dict(
            self._torch_head_sd(hc), depth=2, num_mixer_blocks=4)
        assert tree_shapes(ref) == tree_shapes(converted)
        assert init["init_cam"].shape == (3,)


def _torch_fcblock(x, w, prefix):
    """Linear -> LayerNorm -> ReLU (ref modules.py:11-22)."""
    h = x @ w[f"{prefix}.ff.0.weight"].T + w[f"{prefix}.ff.0.bias"]
    h = torch.nn.functional.layer_norm(
        h, (h.shape[-1],), w[f"{prefix}.ff.1.weight"], w[f"{prefix}.ff.1.bias"])
    return torch.relu(h)


def _torch_mlpblock(x, w, prefix):
    """Linear -> GELU -> Linear (ref modules.py:25-38)."""
    h = x @ w[f"{prefix}.ff.0.weight"].T + w[f"{prefix}.ff.0.bias"]
    h = torch.nn.functional.gelu(h)
    return h @ w[f"{prefix}.ff.3.weight"].T + w[f"{prefix}.ff.3.bias"]


def _torch_token_classifier(tok, w, hc):
    """Reference TokenClassifier forward (token_classifier.py:89-108)."""
    B = tok.shape[0]
    h = _torch_fcblock(tok, w, "decpose.mixer_trans")
    h = h.reshape(B, hc.token_num, hc.hidden_dim)
    for i in range(hc.num_mixer_blocks):
        M = f"decpose.mixer_head.{i}"
        ln = lambda v, key: torch.nn.functional.layer_norm(
            v, (v.shape[-1],), w[f"{key}.weight"], w[f"{key}.bias"])
        y = ln(h, f"{M}.layernorm1").transpose(-1, -2)
        y = _torch_mlpblock(y, w, f"{M}.MLP_token").transpose(-1, -2)
        z = ln(h + y, f"{M}.layernorm2")
        z = _torch_mlpblock(z, w, f"{M}.MLP_channel")
        h = h + y + z
    h = _torch_fcblock(h, w, "decpose.mixer_norm_layer")
    logits = h @ w["decpose.class_pred_layer.weight"].T + \
        w["decpose.class_pred_layer.bias"]
    return torch.softmax(logits, -1)


class TestTokenClassifierNumericParity:
    def test_classifier_matches_torch(self):
        """FCBlock -> 4 mixers -> FCBlock -> class logits -> softmax
        (ref token_classifier.py:89-108, modules.py:11-63)."""
        dec = DecoderConfig(dim=32, depth=1, heads=2, dim_head=8, mlp_dim=32,
                            context_dim=24)
        hc = TokenHeadConfig(token_num=6, token_class_num=8, decoder=dec,
                             hidden_dim=4, hidden_inter_dim=8, token_inter_dim=4)
        helper = TestHeadConverter()
        sd = helper._torch_head_sd(hc, seed=5)
        converted, _ = CV.convert_token_head_state_dict(
            sd, depth=1, num_mixer_blocks=hc.num_mixer_blocks)

        from tokenhmr_tpu.models.token_head import TokenClassifier
        tok = np.random.RandomState(2).randn(3, dec.dim).astype(np.float32)
        out = np.asarray(TokenClassifier(hc).apply(
            {"params": converted["decpose"]}, jnp.asarray(tok)))

        w = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        ref = _torch_token_classifier(torch.from_numpy(tok), w, hc).numpy()
        np.testing.assert_allclose(out, ref, atol=2e-5)


class TestFullHeadIEFNumericParity:
    def test_token_head_ief_matches_torch(self):
        """The complete TokenHead forward — decoder, readouts, classifier,
        frozen PoseVQ decode, IEF accumulation (ref token_head.py:65-128) —
        against a hand-built torch replica driven by one synthetic sd."""
        pq_cfg = PQ.PoseVQConfig(code_dim=16, nb_code=32, width=24, depth=2)
        T = pq_cfg.num_tokens
        dec = DecoderConfig(dim=32, depth=2, heads=2, dim_head=8, mlp_dim=32,
                            context_dim=24)
        hc = TokenHeadConfig(token_num=T, token_class_num=pq_cfg.nb_code,
                             decoder=dec, hidden_dim=4, hidden_inter_dim=8,
                             token_inter_dim=4)
        head_helper = TestHeadConverter()
        sd = head_helper._torch_head_sd(hc, seed=7)
        pq_sd = TestPoseVQConverter()._torch_posevq_sd(pq_cfg, seed=8)
        converted, init = CV.convert_token_head_state_dict(
            sd, depth=2, num_mixer_blocks=hc.num_mixer_blocks)
        pq_conv, codebook = CV.convert_posevq_state_dict(
            pq_sd, pq_cfg.token_size_mul, pq_cfg.token_size_div,
            pq_cfg.down_t, pq_cfg.depth)

        # flax forward
        from tokenhmr_tpu.models.token_head import TokenHead
        from tokenhmr_tpu.models.posevq import PoseVQ, vq_dequantize_logits
        pq_model = PoseVQ(pq_cfg)

        def decode_tokens(simplex):
            z = vq_dequantize_logits(jnp.asarray(codebook), simplex)
            return pq_model.apply({"params": pq_conv["params"]["params"]}
                                  if "params" in pq_conv["params"] else
                                  {"params": pq_conv["params"]}, z,
                                  method=PoseVQ.decode_latents)

        mean_params = {
            "pose": np.asarray(init["init_body_pose"], np.float32).reshape(-1),
            "shape": np.asarray(init["init_betas"], np.float32).reshape(-1),
            "cam": np.asarray(init["init_cam"], np.float32).reshape(-1),
        }
        head = TokenHead(hc, decode_tokens, mean_params)
        rng = np.random.RandomState(4)
        ctx = rng.randn(2, 5, 24).astype(np.float32)
        smpl_params, cam, extras = head.apply(
            {"params": converted}, jnp.asarray(ctx))

        # torch replica
        w = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        pw = {k: torch.from_numpy(np.asarray(v)) for k, v in pq_sd.items()}
        tctx = torch.from_numpy(ctx)
        B = 2

        def lin(x, key, bias=True):
            out = x @ w[f"{key}.weight"].T
            return out + w[f"{key}.bias"] if bias else out

        def lnf(x, key):
            return torch.nn.functional.layer_norm(
                x, (x.shape[-1],), w[f"{key}.weight"], w[f"{key}.bias"])

        def attn(q, k, v, H, Dh):
            Bq, N = q.shape[:2]
            Tk = k.shape[1]
            q = q.reshape(Bq, N, H, Dh).permute(0, 2, 1, 3)
            k = k.reshape(Bq, Tk, H, Dh).permute(0, 2, 1, 3)
            v = v.reshape(Bq, Tk, H, Dh).permute(0, 2, 1, 3)
            a = torch.softmax(q @ k.transpose(-1, -2) * Dh ** -0.5, -1)
            return (a @ v).permute(0, 2, 1, 3).reshape(Bq, N, H * Dh)

        def transformer(token, ctx):
            x = lin(token, "transformer.to_token_embedding")
            x = x + w["transformer.pos_embedding"]
            for i in range(dec.depth):
                L = f"transformer.transformer.layers.{i}"
                h = lnf(x, f"{L}.0.norm")
                q, k, v = lin(h, f"{L}.0.fn.to_qkv", bias=False).chunk(3, -1)
                x = x + lin(attn(q, k, v, dec.heads, dec.dim_head),
                            f"{L}.0.fn.to_out.0")
                h = lnf(x, f"{L}.1.norm")
                k, v = lin(ctx, f"{L}.1.fn.to_kv", bias=False).chunk(2, -1)
                q = lin(h, f"{L}.1.fn.to_q", bias=False)
                x = x + lin(attn(q, k, v, dec.heads, dec.dim_head),
                            f"{L}.1.fn.to_out.0")
                h = lnf(x, f"{L}.2.norm")
                h = torch.nn.functional.gelu(lin(h, f"{L}.2.fn.net.0"))
                x = x + lin(h, f"{L}.2.fn.net.3")
            return x[:, 0]

        def posevq_decode(z):  # z (B, T, code_dim) -> (B, 21, 6)
            tz = z.permute(0, 2, 1)
            c1d = lambda x, p, s=1, pad=1, dil=1: torch.nn.functional.conv1d(
                x, pw[f"{p}.weight"], pw[f"{p}.bias"], stride=s, padding=pad,
                dilation=dil)
            relu = torch.nn.functional.relu
            x = relu(c1d(tz, "decoder.0"))
            sizes = list(np.linspace(21, pq_cfg.num_tokens,
                                     pq_cfg.token_size_div,
                                     endpoint=False, dtype=int)[::-1])
            idx = 2
            for s in sizes:
                x = torch.nn.functional.interpolate(x, size=int(s),
                                                    mode="nearest")
                x = relu(c1d(x, f"decoder.{idx + 1}"))
                idx += 3
            dil = [pq_cfg.dilation_growth_rate ** d
                   for d in range(pq_cfg.depth)][::-1]
            for j, d in enumerate(dil):
                res = x
                h = relu(x)
                h = c1d(h, f"decoder.{idx}.0.model.{j}.conv1", pad=d, dil=d)
                h = relu(h)
                h = c1d(h, f"decoder.{idx}.0.model.{j}.conv2", pad=0)
                x = res + h
            x = c1d(x, f"decoder.{idx}.1")
            x = c1d(x, f"decoder.{idx + 1}")
            return x.permute(0, 2, 1)

        pred_pose = w["init_body_pose"].expand(B, -1).clone()
        pred_betas = w["init_betas"].expand(B, -1).clone()
        pred_cam = w["init_cam"].expand(B, -1).clone()
        for _ in range(hc.ief_iters):
            token = torch.zeros(B, 1, 1)
            tok = transformer(token, tctx)
            grot = lin(tok, "decpose_grot")
            hands = lin(tok, "decpose_hands")
            simplex = _torch_token_classifier(tok, w, hc)
            z = simplex @ torch.from_numpy(np.asarray(codebook))
            bpose = posevq_decode(z).reshape(B, -1)
            pred_pose = torch.cat([grot, bpose, hands], -1) + pred_pose
            pred_betas = lin(tok, "decshape") + pred_betas
            pred_cam = lin(tok, "deccam") + pred_cam

        np.testing.assert_allclose(np.asarray(cam), pred_cam.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(smpl_params["betas"]),
                                   pred_betas.numpy(), atol=2e-5)
        # rotation conversion is covered by tests/test_rotations.py; here we
        # check the accumulated 6D pose drives the same rotmats
        from tokenhmr_tpu.ops.rotations import rotation_6d_to_matrix
        rot_ref = np.asarray(rotation_6d_to_matrix(
            jnp.asarray(pred_pose.numpy().reshape(B, 24, 6))))
        got = np.concatenate([np.asarray(smpl_params["global_orient"]),
                              np.asarray(smpl_params["body_pose"])], axis=1)
        np.testing.assert_allclose(got, rot_ref, atol=2e-5)


class TestDecoderNumericParity:
    def test_cross_attn_layer_matches_torch(self):
        """Converted decoder weights reproduce the reference transformer
        layer math (pose_transformer.py:160-201) exactly."""
        dec = DecoderConfig(dim=16, depth=1, heads=2, dim_head=8, mlp_dim=16,
                            context_dim=24)
        hc = TokenHeadConfig(token_num=4, token_class_num=8, decoder=dec,
                             hidden_dim=4, hidden_inter_dim=8, token_inter_dim=4)
        helper = TestHeadConverter()
        sd = helper._torch_head_sd(hc, seed=3)
        converted, _ = CV.convert_token_head_state_dict(
            sd, depth=1, num_mixer_blocks=hc.num_mixer_blocks)

        from tokenhmr_tpu.models.transformer import TransformerDecoder
        tr = TransformerDecoder(dec)
        rng = np.random.RandomState(0)
        tok = torch.zeros(2, 1, 1)
        ctx = torch.from_numpy(rng.randn(2, 5, 24).astype(np.float32))
        out = np.asarray(tr.apply(
            {"params": converted["transformer"]},
            jnp.asarray(tok.numpy()), jnp.asarray(ctx.numpy())))

        # torch reference
        w = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        def lin(x, key, bias=True):
            out = x @ w[f"{key}.weight"].T
            return out + w[f"{key}.bias"] if bias else out
        def ln(x, key):
            return torch.nn.functional.layer_norm(
                x, (x.shape[-1],), w[f"{key}.weight"], w[f"{key}.bias"])
        x = lin(tok, "transformer.to_token_embedding")
        x = x + w["transformer.pos_embedding"]
        L = "transformer.transformer.layers.0"
        inner = dec.heads * dec.dim_head
        def attn(q, k, v, H, Dh):
            B, N = q.shape[:2]
            T = k.shape[1]
            q = q.reshape(B, N, H, Dh).permute(0, 2, 1, 3)
            k = k.reshape(B, T, H, Dh).permute(0, 2, 1, 3)
            v = v.reshape(B, T, H, Dh).permute(0, 2, 1, 3)
            a = torch.softmax(q @ k.transpose(-1, -2) * Dh ** -0.5, -1)
            return (a @ v).permute(0, 2, 1, 3).reshape(B, N, H * Dh)
        h = ln(x, f"{L}.0.norm")
        qkv = lin(h, f"{L}.0.fn.to_qkv", bias=False)
        q, k, v = qkv.chunk(3, -1)
        x = x + lin(attn(q, k, v, dec.heads, dec.dim_head), f"{L}.0.fn.to_out.0")
        h = ln(x, f"{L}.1.norm")
        kv = lin(ctx, f"{L}.1.fn.to_kv", bias=False)
        k, v = kv.chunk(2, -1)
        q = lin(h, f"{L}.1.fn.to_q", bias=False)
        x = x + lin(attn(q, k, v, dec.heads, dec.dim_head), f"{L}.1.fn.to_out.0")
        h = ln(x, f"{L}.2.norm")
        h = torch.nn.functional.gelu(lin(h, f"{L}.2.fn.net.0"))
        x = x + lin(h, f"{L}.2.fn.net.3")
        np.testing.assert_allclose(out, x.numpy(), atol=2e-5)
