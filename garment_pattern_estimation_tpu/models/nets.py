"""Model families: pattern-shape regression (LSTM + attention variants) and
the stitch pair classifier.

Flax re-designs of the reference's `nn/nets.py` models. Each flax module is
pure/functional; `models.registry.build_model` wraps it together with the
merged config + composed loss into the experiment-facing object (mirroring
the reference's config-merging constructor behavior at nn/nets.py:49-130).

Predictions are a dict:
    outlines        (B, P, L, element_size)
    rotations       (B, P, rotation_size)
    translations    (B, P, translation_size)
    stitch_tags     (B, P, L, stitch_tag_dim)
    free_edges_mask (B, P, L) — logits
    att_weights     (B, N, P) — sparsemax scores (attention model only)
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from . import blocks
from ..ops.sparsemax import sparsemax
from ..ops.pooling import GLOBAL_POOLS


class GarmentFullPattern3DModule(nn.Module):
    """Baseline NeuralTailor shape model: global encoder -> pattern LSTM
    unrolls panel encodings -> shared panel LSTM unrolls edges + a linear
    placement head (reference: nn/nets.py:41-184)."""
    # data shape
    element_size: int = 4
    max_panel_len: int = 14
    max_pattern_size: int = 23
    rotation_size: int = 4
    translation_size: int = 3
    # architecture
    panel_encoding_size: int = 250
    panel_hidden_size: int = 250
    panel_n_layers: int = 3
    pattern_encoding_size: int = 250
    pattern_hidden_size: int = 250
    pattern_n_layers: int = 2
    dropout: float = 0.0
    lstm_init: str = 'kaiming_normal_'
    stitch_tag_dim: int = 3
    feature_extractor: str = 'EdgeConvFeatures'
    panel_decoder: str = 'LSTMDecoderModule'
    pattern_decoder: str = 'LSTMDecoderModule'
    # encoder knobs — defaults MATCH the registry's reference defaults
    # (models/registry.py::_SHAPE_MODEL_DEFAULTS <- nn/net_blocks.py:98-109),
    # so direct module instantiation builds the same architecture as
    # build_model with no config (the published att.yaml overrides
    # econv_feature=150 / skip_connections=True explicitly)
    conv_depth: int = 2
    k_neighbors: int = 5
    econv_hidden: int = 200
    econv_hidden_depth: int = 2
    econv_feature: int = 112
    econv_aggr: str = 'max'
    global_pool: str = 'mean'
    skip_connections: bool = False
    graph_pooling: bool = False
    pool_ratio: float = 0.1
    use_pallas: bool | None = None
    compute_dtype: str | None = None   # e.g. 'bfloat16' for the encoder MLPs
    # conv layer ids exempted from compute_dtype (kept f32) — the
    # placement-safe mixed-precision mode keeps conv0 (raw-geometry layer)
    # exact while the wide conv1 matmuls ride the MXU in bf16
    f32_conv_layers: tuple = ()
    # keep the attention head (point_segment_mlp) f32 under bf16 compute —
    # a precision island complementary to f32_conv_layers: the attention
    # MLP is tiny (B·N×~153 rows) so exempting it costs ~nothing while
    # the sparsemax routing weights stay exact (attention model only)
    f32_attention_mlp: bool = False
    # chunk size for the chunked EdgeConv training path (NN.edgeconv_train_chunk)
    edgeconv_train_chunk: int | None = None
    # sweep schedule of the chunked EdgeConv training path
    # (NN.edgeconv_train_mode: 'chunked' | 'fused_final' | 'streamed')
    edgeconv_train_mode: str = 'fused_final'

    def setup(self):
        self.encoder = self._make_encoder()
        self.pattern_dec = blocks.DECODER_REGISTRY[self.pattern_decoder](
            encoding_size=self.pattern_encoding_size,
            hidden_size=self.pattern_hidden_size,
            out_elem_size=self.panel_encoding_size,
            n_layers=self.pattern_n_layers,
            out_len=self.max_pattern_size,
            dropout=self.dropout,
            state_init=self.lstm_init,
            name='pattern_decoder')
        self.panel_dec = self._make_panel_decoder()
        self.placement_decoder = nn.Dense(
            self.rotation_size + self.translation_size, name='placement_decoder')

    def _make_encoder(self):
        encoder_cls = blocks.ENCODER_REGISTRY[self.feature_extractor]
        if self.feature_extractor == 'EdgeConvFeatures':
            return encoder_cls(
                out_size=self.pattern_encoding_size,
                conv_depth=self.conv_depth, k_neighbors=self.k_neighbors,
                econv_hidden=self.econv_hidden,
                econv_hidden_depth=self.econv_hidden_depth,
                econv_feature=self.econv_feature, econv_aggr=self.econv_aggr,
                global_pool=self.global_pool,
                skip_connections=self.skip_connections,
                graph_pooling=self.graph_pooling, pool_ratio=self.pool_ratio,
                use_pallas=self.use_pallas, compute_dtype=self.compute_dtype,
                f32_conv_layers=self.f32_conv_layers,
                train_chunk_size=self.edgeconv_train_chunk,
                train_mode=self.edgeconv_train_mode,
                name='feature_extractor')
        if self.feature_extractor == 'EdgeConvPoolingFeatures':
            return encoder_cls(
                out_size=self.pattern_encoding_size,
                k=self.k_neighbors, pool_ratio=self.pool_ratio,
                use_pallas=self.use_pallas, name='feature_extractor')
        return encoder_cls(
            out_size=self.pattern_encoding_size,
            econv_hidden=self.econv_hidden, econv_feature=self.econv_feature,
            name='feature_extractor')

    def _make_panel_decoder(self):
        # each decoded edge element: outline + stitch tag + free-edge logit
        return blocks.DECODER_REGISTRY[self.panel_decoder](
            encoding_size=self.panel_encoding_size,
            hidden_size=self.panel_hidden_size,
            out_elem_size=self.element_size + self.stitch_tag_dim + 1,
            n_layers=self.panel_n_layers,
            out_len=self.max_panel_len,
            dropout=self.dropout,
            state_init=self.lstm_init,
            name='panel_decoder')

    # --- forward stages (kept separable for latent-space inspection,
    #     mirroring forward_encode/forward_*_decode in the reference) ---
    def encode(self, positions, train=False):
        encoding, _, _ = self.encoder(positions, pool_global=True, train=train)
        return encoding

    def decode_panels(self, flat_panel_encodings, batch_size, train=False):
        flat_panels = self.panel_dec(flat_panel_encodings, train=train)
        flat_placement = self.placement_decoder(flat_panel_encodings)

        panels = flat_panels.reshape(
            batch_size, self.max_pattern_size, self.max_panel_len, -1)
        outlines = panels[..., :self.element_size]
        stitch_tags = panels[..., self.element_size:-1]
        free_edge_logits = panels[..., -1]

        rotations = flat_placement[:, :self.rotation_size].reshape(
            batch_size, self.max_pattern_size, -1)
        translations = flat_placement[:, self.rotation_size:].reshape(
            batch_size, self.max_pattern_size, -1)
        return {
            'outlines': outlines,
            'rotations': rotations, 'translations': translations,
            'stitch_tags': stitch_tags, 'free_edges_mask': free_edge_logits,
        }

    def __call__(self, positions, train: bool = False):
        encodings = self.encode(positions, train=train)
        panel_encodings = self.pattern_dec(encodings, train=train)
        flat = panel_encodings.reshape(-1, panel_encodings.shape[-1])
        return self.decode_panels(flat, positions.shape[0], train=train)


class GarmentSegmentPattern3DModule(GarmentFullPattern3DModule):
    """NeuralTailor attention model: per-point MLP + sparsemax scores route
    point features into `max_pattern_size` panel slots; the pooled per-panel
    features replace the pattern-decoder LSTM (reference: nn/nets.py:187-299)."""
    local_attention: bool = True

    def setup(self):
        self.encoder = self._make_encoder()
        self.panel_dec = self._make_panel_decoder()
        self.placement_decoder = nn.Dense(
            self.rotation_size + self.translation_size, name='placement_decoder')

        att_in = self.econv_feature
        if not self.local_attention:
            att_in += self.pattern_encoding_size
        if self.skip_connections:
            att_in += 3  # raw xyz concatenated by the encoder
        self.point_segment_mlp = blocks.MLP(
            [att_in, att_in, self.max_pattern_size],
            compute_dtype=(None if self.f32_attention_mlp
                           else self.compute_dtype),
            name='point_segment_mlp')
        self.panel_dec_lin = nn.Dense(self.panel_encoding_size, name='panel_dec_lin')

    def panel_encodings_from_3d(self, positions, train=False):
        """(panel encodings (B, P, E), attention weights (B, N, P))."""
        B = positions.shape[0]
        global_enc, point_features, _ = self.encoder(
            positions, pool_global=not self.local_attention, train=train)
        # the point count comes from the ENCODER output: graph pooling
        # coarsens N (positions.shape[1] would mis-size every reshape below)
        N = point_features.shape[1]

        if self.local_attention:
            att_input = point_features
        else:
            propagated = jnp.broadcast_to(
                global_enc[:, None, :], (B, N, global_enc.shape[-1]))
            att_input = jnp.concatenate([propagated, point_features], axis=-1)

        logits = self.point_segment_mlp(
            att_input.reshape(B * N, -1), train=train).reshape(B, N, -1)
        weights = sparsemax(logits.astype(jnp.float32))                                # (B, N, P)

        # per-panel pooled features: weight points, pool over N, project.
        # mean/add pools contract over N directly as a matmul (MXU) instead
        # of materializing the (B, P, N, F) weighted tensor (1.8 GB at the
        # published scale — the single largest HBM cost of the forward pass)
        if self.global_pool in ('mean', 'add'):
            pooled = jnp.einsum('bnp,bnf->bpf', weights, point_features)
            if self.global_pool == 'mean':
                pooled = pooled / N
        else:  # max: genuinely needs the per-panel weighted features
            weighted = jnp.einsum('bnp,bnf->bpnf', weights, point_features)
            pooled = GLOBAL_POOLS[self.global_pool](
                weighted.reshape(B * self.max_pattern_size, N, -1)) \
                .reshape(B, self.max_pattern_size, -1)
        panel_encodings = self.panel_dec_lin(pooled)
        return panel_encodings, weights

    def __call__(self, positions, train: bool = False):
        B = positions.shape[0]
        panel_encodings, att_weights = self.panel_encodings_from_3d(positions, train=train)
        preds = self.decode_panels(
            panel_encodings.reshape(-1, panel_encodings.shape[-1]), B, train=train)
        preds['att_weights'] = att_weights
        return preds


class StitchOnEdge3DPairsModule(nn.Module):
    """Binary stitch classifier on 16-float edge pairs. NOTE: the reference's
    MLP applies ReLU+BatchNorm after *every* linear layer including the logit
    head (nn/net_blocks.py:43-47, nn/nets.py:339-340); reproduced verbatim so
    reference .pth checkpoints behave identically."""
    pair_feature_len: int = 16
    stitch_hidden_size: int = 200
    stitch_mlp_n_layers: int = 3

    @nn.compact
    def __call__(self, pairs, train: bool = False):
        sizes = [self.stitch_hidden_size] * self.stitch_mlp_n_layers + [1]
        flat = pairs.reshape(-1, pairs.shape[-1])
        out = blocks.MLP(sizes, name='mlp')(flat, train=train)
        return out.reshape(pairs.shape[:-1])
