"""TDNN config generation (the steps/nnet3/make_tdnn_configs.py role).

(ref: egs/wsj/s5/steps/nnet3/make_tdnn_configs.py — emits the config lines
 consumed by nnet3-init; here they feed Nnet3(config_text).)
"""

from __future__ import annotations


def make_tdnn_config(
    feat_dim: int,
    num_targets: int,
    splice_indexes=((-2, -1, 0, 1, 2), (-1, 2), (-3, 3), (0,)),
    hidden_dim: int = 512,
    nonlinearity: str = "RectifiedLinearComponent",
    pnorm_output_dim: int | None = None,
    final_logsoftmax: bool = True,
) -> str:
    """-> nnet3 config text for a multisplice TDNN.

    nonlinearity="PnormComponent" reduces hidden_dim -> pnorm_output_dim
    per layer (default hidden_dim // 8, the reference's group-of-8), like
    make_tdnn_configs.py's --pnorm-input-dim/--pnorm-output-dim pair.
    """
    is_pnorm = nonlinearity == "PnormComponent"
    if is_pnorm and pnorm_output_dim is None:
        pnorm_output_dim = max(hidden_dim // 8, 1)
    nonlin_out = pnorm_output_dim if is_pnorm else hidden_dim
    lines = [f"input-node name=input dim={feat_dim}"]
    prev, prev_dim = "input", feat_dim
    for li, ctx in enumerate(splice_indexes):
        in_dim = prev_dim * len(ctx)
        desc = ("Append(%s)" % ", ".join(
            prev if o == 0 else f"Offset({prev},{o})" for o in ctx)
            if len(ctx) > 1 else
            (prev if ctx[0] == 0 else f"Offset({prev},{ctx[0]})"))
        nonlin_cfg = (f"input-dim={hidden_dim} output-dim={nonlin_out}"
                      if is_pnorm else f"dim={hidden_dim}")
        lines += [
            f"component name=tdnn{li}.affine "
            f"type=NaturalGradientAffineComponent "
            f"input-dim={in_dim} output-dim={hidden_dim}",
            f"component-node name=tdnn{li}.affine_node "
            f"component=tdnn{li}.affine input={desc}",
            f"component name=tdnn{li}.nonlin type={nonlinearity} "
            f"{nonlin_cfg}",
            f"component-node name=tdnn{li} component=tdnn{li}.nonlin "
            f"input=tdnn{li}.affine_node",
            f"component name=tdnn{li}.norm type=NormalizeComponent "
            f"dim={nonlin_out}",
            f"component-node name=tdnn{li}n component=tdnn{li}.norm "
            f"input=tdnn{li}",
        ]
        prev, prev_dim = f"tdnn{li}n", nonlin_out
    lines += [
        f"component name=final.affine type=NaturalGradientAffineComponent "
        f"input-dim={prev_dim} output-dim={num_targets}",
        f"component-node name=final.affine_node component=final.affine "
        f"input={prev}",
    ]
    if final_logsoftmax:
        lines += [
            f"component name=final.log type=LogSoftmaxComponent "
            f"dim={num_targets}",
            "component-node name=final.log_node component=final.log "
            "input=final.affine_node",
            "output-node name=output input=final.log_node",
        ]
    else:
        lines.append("output-node name=output input=final.affine_node")
    return "\n".join(lines) + "\n"
