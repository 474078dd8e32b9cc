"""Weight-copy helpers: flax params → reference torch modules (parity tests).

Never imports reference code at module import time; call sites use the
``reference_path`` fixture which puts /root/reference/MinGraph-UNet on
sys.path.
"""

import numpy as np


def to_torch_conv(t_conv, kernel, bias):
    import torch

    # flax Conv kernel (kh, kw, in, out) → torch (out, in, kh, kw)
    t_conv.weight.data = torch.from_numpy(np.asarray(kernel).transpose(3, 2, 0, 1).copy())
    if bias is not None:
        t_conv.bias.data = torch.from_numpy(np.asarray(bias).copy())


def to_torch_conv_transpose(t_conv, kernel, bias):
    import torch

    # flax ConvTranspose (transpose_kernel=False) applies the kernel without
    # the gradient-style spatial mirror torch uses, so the mapping includes a
    # spatial flip: torch (in, out, kh, kw) = flip_hw(kernel).T(2,3,0,1).
    k = np.asarray(kernel)[::-1, ::-1].transpose(2, 3, 0, 1)
    t_conv.weight.data = torch.from_numpy(k.copy())
    if bias is not None:
        t_conv.bias.data = torch.from_numpy(np.asarray(bias).copy())


def to_torch_linear(t_lin, kernel, bias=None):
    import torch

    # flax Dense kernel (in, out) → torch (out, in)
    t_lin.weight.data = torch.from_numpy(np.asarray(kernel).T.copy())
    if bias is not None and t_lin.bias is not None:
        t_lin.bias.data = torch.from_numpy(np.asarray(bias).copy())


def to_torch_bn(t_bn, scale, bias, mean=None, var=None):
    import torch

    t_bn.weight.data = torch.from_numpy(np.asarray(scale).copy())
    t_bn.bias.data = torch.from_numpy(np.asarray(bias).copy())
    if mean is not None:
        t_bn.running_mean.data = torch.from_numpy(np.asarray(mean).copy())
    if var is not None:
        t_bn.running_var.data = torch.from_numpy(np.asarray(var).copy())


def copy_convblock(t_block, params, stats=None):
    """flax ConvBlock params → reference ConvBlock (conv1/bn1/conv2/bn2)."""
    to_torch_conv(t_block.conv1, params["conv1"]["kernel"], params["conv1"]["bias"])
    to_torch_conv(t_block.conv2, params["conv2"]["kernel"], params["conv2"]["bias"])
    if t_block.use_batchnorm:
        s = stats or {}
        to_torch_bn(
            t_block.bn1,
            params["bn1"]["scale"],
            params["bn1"]["bias"],
            s.get("bn1", {}).get("mean"),
            s.get("bn1", {}).get("var"),
        )
        to_torch_bn(
            t_block.bn2,
            params["bn2"]["scale"],
            params["bn2"]["bias"],
            s.get("bn2", {}).get("mean"),
            s.get("bn2", {}).get("var"),
        )


def copy_unet(torch_unet, variables, depth=4):
    """Copy a flax UNet's variables into the reference torch UNet."""
    p = variables["params"]
    stats = variables.get("batch_stats", {})
    enc_p = p["encoder"]
    enc_s = stats.get("encoder", {})
    for i in range(depth):
        copy_convblock(
            torch_unet.encoder.encoder_blocks[i], enc_p[f"block{i}"], enc_s.get(f"block{i}")
        )
    copy_convblock(torch_unet.encoder.bottleneck, enc_p["bottleneck"], enc_s.get("bottleneck"))
    dec_p = p["decoder"]
    dec_s = stats.get("decoder", {})
    for j in range(depth):
        tb = torch_unet.decoder.decoder_blocks[j]
        fb = dec_p[f"block{j}"]
        fs = dec_s.get(f"block{j}", {})
        to_torch_conv_transpose(tb.upsample, fb["upsample"]["kernel"], fb["upsample"]["bias"])
        copy_convblock(tb.conv_block, fb["conv_block"], fs.get("conv_block"))
    to_torch_conv(
        torch_unet.decoder.final_conv, dec_p["final_conv"]["kernel"], dec_p["final_conv"]["bias"]
    )


def copy_gat_head(t_head, W_h, a_src_h, a_dst_h):
    """One flax GAT head → reference GraphAttentionLayer."""
    import torch

    to_torch_linear(t_head.W, W_h)  # W_h (in, out)
    a = np.concatenate([np.asarray(a_src_h), np.asarray(a_dst_h)])[None, :]  # (1, 2*out)
    t_head.a.weight.data = torch.from_numpy(a.copy())


def copy_multihead(t_multi, head_params):
    """flax _HeadParams dict {W (H,in,out), a_src (H,out), a_dst} → reference
    MultiHeadGATLayer."""
    W = np.asarray(head_params["W"])
    a_src = np.asarray(head_params["a_src"])
    a_dst = np.asarray(head_params["a_dst"])
    for h, t_head in enumerate(t_multi.heads):
        copy_gat_head(t_head, W[h], a_src[h], a_dst[h])
