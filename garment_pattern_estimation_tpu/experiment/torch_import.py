"""Reference `.pth` checkpoint import: torch state dicts -> flax variables.

BASELINE compatibility requirement: reference checkpoints load unchanged.
The torch models are built from four primitives, each with a fixed name
scheme (verified against models/att/neural_tailor_stitch_model.pth):

  * MLP:   `<p>.{i}.0.{weight,bias}` (Linear) +
           `<p>.{i}.2.{weight,bias,running_mean,running_var}` (BatchNorm1d)
  * Dense: `<p>.{weight,bias}`
  * LSTM:  `<p>.{weight_ih_l{k},weight_hh_l{k},bias_ih_l{k},bias_hh_l{k}}`
  * GRU:   same names, 3 gates

Our flax modules keep torch's weight layout and gate order (see
models/blocks.py), so the import is a rename + a transpose on Dense kernels.
DataParallel's 'module.' prefix is stripped. Optimizer/scheduler states are
framework-specific and are not imported.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _torch_state_dict(path):
    import torch
    ckpt = torch.load(str(path), map_location='cpu', weights_only=False)
    meta = {}
    if isinstance(ckpt, dict) and 'model_state_dict' in ckpt:
        state = ckpt['model_state_dict']
        meta['epoch'] = ckpt.get('epoch')
    else:
        state = ckpt
    out = {}
    for key, value in state.items():
        if key.startswith('module.'):
            key = key[len('module.'):]
        if key.endswith('num_batches_tracked'):
            continue
        out[key] = np.asarray(value.detach().cpu().numpy())
    return out, meta


def _dense(sd, prefix):
    return {'kernel': sd[f'{prefix}.weight'].T.copy(),
            'bias': sd[f'{prefix}.bias'].copy()}


def _mlp(sd, prefix):
    """(params, batch_stats) for a reference MLP block under `prefix`."""
    params, stats = {}, {}
    i = 0
    while f'{prefix}.{i}.0.weight' in sd:
        params[f'Dense_{i}'] = _dense(sd, f'{prefix}.{i}.0')
        params[f'BatchNorm_{i}'] = {'scale': sd[f'{prefix}.{i}.2.weight'].copy(),
                                    'bias': sd[f'{prefix}.{i}.2.bias'].copy()}
        stats[f'BatchNorm_{i}'] = {'mean': sd[f'{prefix}.{i}.2.running_mean'].copy(),
                                   'var': sd[f'{prefix}.{i}.2.running_var'].copy()}
        i += 1
    if i == 0:
        raise KeyError(f'torch_import::no MLP layers found under <{prefix}>')
    return params, stats


def _rnn(sd, prefix):
    """Multi-layer LSTM/GRU params under `prefix` (torch layout preserved)."""
    params = {}
    layer = 0
    while f'{prefix}.weight_ih_l{layer}' in sd:
        params[f'l{layer}_w_ih'] = sd[f'{prefix}.weight_ih_l{layer}'].copy()
        params[f'l{layer}_w_hh'] = sd[f'{prefix}.weight_hh_l{layer}'].copy()
        params[f'l{layer}_b_ih'] = sd[f'{prefix}.bias_ih_l{layer}'].copy()
        params[f'l{layer}_b_hh'] = sd[f'{prefix}.bias_hh_l{layer}'].copy()
        layer += 1
    if layer == 0:
        raise KeyError(f'torch_import::no RNN layers found under <{prefix}>')
    return params


def import_stitch_model(pth_path):
    """StitchOnEdge3DPairs .pth -> {'params', 'batch_stats'} variables."""
    sd, meta = _torch_state_dict(pth_path)
    mlp_params, mlp_stats = _mlp(sd, 'mlp')
    variables = {'params': {'mlp': mlp_params},
                 'batch_stats': {'mlp': mlp_stats}}
    return {'variables': variables, 'epoch': meta.get('epoch')}


def import_shape_model(pth_path, model_name='GarmentSegmentPattern3D'):
    """GarmentFullPattern3D / GarmentSegmentPattern3D .pth -> flax variables.

    Mapping (torch -> flax param path):
      feature_extractor.conv_layers.{i}.nn  -> feature_extractor/conv{i}/MLP_0
      feature_extractor.lin                 -> feature_extractor/lin
      point_segment_mlp.0                   -> point_segment_mlp      (att model)
      panel_dec_lin                         -> panel_dec_lin          (att model)
      pattern_decoder.{lstm,lin}            -> pattern_decoder/{lstm,lin} (base)
      panel_decoder.{lstm,lin}              -> panel_decoder/{lstm,lin}
      placement_decoder                     -> placement_decoder
    """
    sd, meta = _torch_state_dict(pth_path)
    params, batch_stats = {}, {}

    # encoder convs
    fe_params, fe_stats = {}, {}
    conv_id = 0
    while f'feature_extractor.conv_layers.{conv_id}.nn.0.0.weight' in sd:
        mlp_params, mlp_stats = _mlp(sd, f'feature_extractor.conv_layers.{conv_id}.nn')
        fe_params[f'conv{conv_id}'] = {'MLP_0': mlp_params}
        fe_stats[f'conv{conv_id}'] = {'MLP_0': mlp_stats}
        conv_id += 1
    if f'feature_extractor.lin.weight' in sd:
        fe_params['lin'] = _dense(sd, 'feature_extractor.lin')
    params['feature_extractor'] = fe_params
    batch_stats['feature_extractor'] = fe_stats

    if 'point_segment_mlp.0.0.0.weight' in sd:  # attention model
        mlp_params, mlp_stats = _mlp(sd, 'point_segment_mlp.0')
        params['point_segment_mlp'] = mlp_params
        batch_stats['point_segment_mlp'] = mlp_stats
        params['panel_dec_lin'] = _dense(sd, 'panel_dec_lin')

    if 'pattern_decoder.lstm.weight_ih_l0' in sd:
        params['pattern_decoder'] = {'lstm': _rnn(sd, 'pattern_decoder.lstm'),
                                     'lin': _dense(sd, 'pattern_decoder.lin')}
    elif any(k.startswith('pattern_decoder.') for k in sd):
        raise NotImplementedError(
            'torch_import::unrecognized pattern_decoder layout in checkpoint '
            '(only the LSTM pattern decoder is mapped): '
            + ', '.join(sorted(k for k in sd
                               if k.startswith('pattern_decoder.'))[:4]))
    if 'panel_decoder.lstm.weight_ih_l0' in sd:
        params['panel_decoder'] = {'lstm': _rnn(sd, 'panel_decoder.lstm'),
                                   'lin': _dense(sd, 'panel_decoder.lin')}
    elif 'panel_decoder.recurrent_cell.weight_ih_l0' in sd:  # GRU decoder
        params['panel_decoder'] = {'gru': _rnn(sd, 'panel_decoder.recurrent_cell'),
                                   'lin': _dense(sd, 'panel_decoder.lin')}
    elif any(k.startswith('panel_decoder.') for k in sd):
        # fail HERE, not as a cryptic missing-parameter error at apply():
        # e.g. the double-reverse decoder's lstm_reverse/lstm_forward layout
        raise NotImplementedError(
            'torch_import::unrecognized panel_decoder layout in checkpoint '
            '(LSTM and GRU decoders are mapped): '
            + ', '.join(sorted(k for k in sd
                               if k.startswith('panel_decoder.'))[:4]))
    params['placement_decoder'] = _dense(sd, 'placement_decoder')

    variables = {'params': params, 'batch_stats': batch_stats}
    return {'variables': variables, 'epoch': meta.get('epoch')}


def load_checkpoint_any(path, template=None, model_name=None):
    """Load either a native msgpack checkpoint or a reference .pth file."""
    path = Path(path)
    if path.suffix == '.pth':
        sd_probe, _ = _torch_state_dict(path)
        if any(key.startswith('mlp.') for key in sd_probe):
            return import_stitch_model(path)
        return import_shape_model(path, model_name or 'GarmentSegmentPattern3D')
    from .checkpoint import load_checkpoint_file
    return load_checkpoint_file(path, template=template)
