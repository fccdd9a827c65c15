"""Model factory: name + configs -> (flax module, merged config, loss).

Mirrors the reference's dynamic `getattr(nets, config['NN']['model'])`
construction (nn/train.py:120-121) and its config-merging constructors
(nn/nets.py:49-130): class defaults <- YAML NN section <- backfilled
compatibility keys, with the merged dict exposed for experiment tracking.
"""
from __future__ import annotations

import jax

from . import nets
from ..losses.composed import ComposedLoss, ComposedPatternLoss

# YAML / reference config key -> flax module field
_FIELD_MAP = {
    'EConv_hidden': 'econv_hidden',
    'EConv_hidden_depth': 'econv_hidden_depth',
    'EConv_feature': 'econv_feature',
    'EConv_aggr': 'econv_aggr',
}

_SHAPE_MODEL_DEFAULTS = {
    'panel_encoding_size': 250,
    'panel_hidden_size': 250,
    'panel_n_layers': 3,
    'pattern_encoding_size': 250,
    'pattern_hidden_size': 250,
    'pattern_n_layers': 2,
    'dropout': 0,
    'lstm_init': 'kaiming_normal_',
    'feature_extractor': 'EdgeConvFeatures',
    'panel_decoder': 'LSTMDecoderModule',
    'pattern_decoder': 'LSTMDecoderModule',
    'stitch_tag_dim': 3,
    # encoder defaults (nn/net_blocks.py:98-109)
    'conv_depth': 2,
    'k_neighbors': 5,
    'EConv_hidden': 200,
    'EConv_hidden_depth': 2,
    'EConv_feature': 112,
    'EConv_aggr': 'max',
    'global_pool': 'mean',
    'skip_connections': False,
    'graph_pooling': False,
    'pool_ratio': 0.1,
}

_SHAPE_LOSS_DEFAULTS = {
    'loss_components': ['shape', 'loop', 'rotation', 'translation'],
    'quality_components': ['shape', 'discrete', 'rotation', 'translation'],
    'loop_loss_weight': 1.0,
    'stitch_tags_margin': 0.3,
    'epoch_with_stitches': 40,
    'stitch_supervised_weight': 0.1,
    'stitch_hardnet_version': False,
    'panel_origin_invariant_loss': True,
}

_STITCH_MODEL_DEFAULTS = {
    'stitch_hidden_size': 200,
    'stitch_mlp_n_layers': 3,
}

_STITCH_LOSS_DEFAULTS = {
    'loss_components': ['edge_pair_class'],
    'quality_components': ['edge_pair_class', 'edge_pair_stitch_recall'],
    'panel_origin_invariant_loss': False,
    'panel_order_inariant_loss': False,
}


class GarmentModel:
    """Bundles the flax module, merged config, and composed loss — the
    experiment-facing model object."""

    def __init__(self, name, module, config, loss):
        self.name = name
        self.module = module
        self.config = config
        self.loss = loss

    # ---- functional API ----
    def init_variables(self, rng, sample_features, train=True):
        rngs = {'params': rng,
                'recurrent_init': jax.random.fold_in(rng, 1),
                'dropout': jax.random.fold_in(rng, 2)}
        return self.module.init(rngs, sample_features, train=train)

    def apply(self, variables, features, train=False, rngs=None, mutable=None):
        """Forward pass. In training mode returns (preds, mutated variables
        dict with updated batch_stats); in eval just preds."""
        if mutable is None:
            mutable = ['batch_stats'] if train else False
        return self.module.apply(variables, features, train=train,
                                 rngs=rngs or {}, mutable=mutable)


def build_model(model_name, data_config, nn_config=None, loss_config=None,
                use_pallas=None, compute_dtype=None):
    """Construct a model family by its reference name.

    `compute_dtype` (or a 'compute_dtype' key in nn_config): e.g. 'bfloat16'
    to run the encoder MLP matmuls on the MXU in bf16 (params stay f32)."""
    nn_config = dict(nn_config or {})
    nn_config.pop('loss', None)  # loss section travels separately
    compute_dtype = compute_dtype or nn_config.pop('compute_dtype', None)
    # precision islands: conv layer ids kept f32 under bf16 compute
    # (NN.f32_conv_layers: [0] = the placement-safe mixed-precision mode)
    f32_conv_layers = tuple(nn_config.pop('f32_conv_layers', ()) or ())
    # keep the attention head f32 under bf16 compute (attention model only)
    f32_attention_mlp = bool(nn_config.pop('f32_attention_mlp', False))
    # chunked-EdgeConv training sweep width (stress-scale tuning knob)
    edgeconv_train_chunk = nn_config.pop('edgeconv_train_chunk', None)
    # chunked-EdgeConv sweep schedule: 'chunked' | 'fused_final' | 'streamed'
    # (ops/edgeconv_train — identical math, different recompute/memory)
    edgeconv_train_mode = nn_config.pop('edgeconv_train_mode', 'fused_final')
    loss_config = dict(loss_config or {})

    if model_name in ('GarmentFullPattern3D', 'GarmentSegmentPattern3D'):
        config = dict(_SHAPE_MODEL_DEFAULTS)
        if model_name == 'GarmentSegmentPattern3D':
            config['local_attention'] = False  # old-run default (nn/nets.py:208-210)
        # backwards-compat backfill (nn/nets.py:75-78)
        if 'panel_hidden_size' not in nn_config and 'panel_encoding_size' in nn_config:
            nn_config['panel_hidden_size'] = nn_config['panel_encoding_size']
        if 'pattern_hidden_size' not in nn_config and 'pattern_encoding_size' in nn_config:
            nn_config['pattern_hidden_size'] = nn_config['pattern_encoding_size']
        config.update({k: v for k, v in nn_config.items() if k in config
                       or k in ('local_attention',)})

        full_loss_config = dict(_SHAPE_LOSS_DEFAULTS)
        full_loss_config.update(loss_config)
        loss = ComposedPatternLoss(data_config, full_loss_config)

        module_kwargs = dict(
            element_size=data_config['element_size'],
            max_panel_len=data_config['max_panel_len'],
            max_pattern_size=data_config['max_pattern_len'],
            rotation_size=data_config['rotation_size'],
            translation_size=data_config['translation_size'],
            use_pallas=use_pallas,
            compute_dtype=compute_dtype,
            f32_conv_layers=f32_conv_layers,
            f32_attention_mlp=f32_attention_mlp,
            edgeconv_train_chunk=edgeconv_train_chunk,
            edgeconv_train_mode=edgeconv_train_mode,
        )
        for key, value in config.items():
            field = _FIELD_MAP.get(key, key)
            module_kwargs[field] = value
        module_kwargs['dropout'] = float(module_kwargs.get('dropout', 0) or 0)
        if model_name == 'GarmentFullPattern3D':
            module_kwargs.pop('local_attention', None)
            module = nets.GarmentFullPattern3DModule(**module_kwargs)
        else:
            module = nets.GarmentSegmentPattern3DModule(**module_kwargs)

        merged = dict(config)
        merged['model'] = model_name
        merged['loss'] = loss.config
        # re-attach the keys popped above: the trainer stores this merged
        # config as the run's NN section (trainer.py::add_config), and
        # load_model rebuilds from it — without these, a bf16/island run
        # would silently reload as plain f32 and lose its chunk override
        merged['compute_dtype'] = compute_dtype
        merged['f32_conv_layers'] = list(f32_conv_layers)
        merged['f32_attention_mlp'] = f32_attention_mlp
        merged['edgeconv_train_chunk'] = edgeconv_train_chunk
        merged['edgeconv_train_mode'] = edgeconv_train_mode
        return GarmentModel(model_name, module, merged, loss)

    if model_name == 'StitchOnEdge3DPairs':
        config = dict(_STITCH_MODEL_DEFAULTS)
        config.update({k: v for k, v in nn_config.items() if k in config})
        full_loss_config = dict(_STITCH_LOSS_DEFAULTS)
        full_loss_config.update(loss_config)
        loss = ComposedLoss(data_config, full_loss_config)
        module = nets.StitchOnEdge3DPairsModule(
            pair_feature_len=data_config['element_size'],
            stitch_hidden_size=config['stitch_hidden_size'],
            stitch_mlp_n_layers=config['stitch_mlp_n_layers'])
        merged = dict(config)
        merged['model'] = model_name
        merged['loss'] = loss.config
        return GarmentModel(model_name, module, merged, loss)

    raise ValueError(f'models.registry::unknown model <{model_name}>')
