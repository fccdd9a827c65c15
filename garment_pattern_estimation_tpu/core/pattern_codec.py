"""NN tensor codec for sewing patterns (numpy, host-side).

Behavioral counterpart of the reference's ``NNSewingPattern``
(nn/data/pattern_converter.py:35-611), framework-free: tensors are numpy
arrays and the stitch classifier is passed as a plain callable, so the codec
works identically under JAX, tests, and CLI tools.

Tensor conventions (all sizes are padded maxima):
  * outlines:      (num_panels, num_edges, 4)  — additive 2D edge vector + 2 curvature coords
  * rotations:     (num_panels, 4)             — quaternion (x, y, z, w)
  * translations:  (num_panels, 3)             — 'universal' top-mid-bbox world point
  * stitches:      (2, num_stitches) int       — pattern-level edge ids `panel_id * max_edges + edge_id`;
                                                  padded entries are (0, 0)
  * stitch tags:   (num_panels, num_edges, 3)  — per-edge approximate 3D stitch location, zeros on free edges
"""
from __future__ import annotations

import copy

import numpy as np

from . import rotations as rot_tools
from .pattern_spec import PatternSpec, panel_spec_template


class EmptyPanelError(Exception):
    pass


class InvalidPatternDefError(Exception):
    """The given pattern definition (e.g. numeric representation) is not
    self-consistent — e.g. stitches referring to non-existing edges."""

    def __init__(self, pattern_name='', message=''):
        self.message = f'Pattern {pattern_name} is invalid'
        if message:
            self.message += ': ' + message
        super().__init__(self.message)


class NNSewingPattern(PatternSpec):
    """Sewing pattern with NN-friendly tensor encode/decode."""

    def __init__(self, pattern_file=None, view_ids=False, panel_classifier=None, template_name=None):
        self.panel_classifier = panel_classifier
        self.template_name = template_name
        super().__init__(pattern_file=pattern_file, view_ids=view_ids)

    # ------------------- panel ordering -------------------
    def panel_order(self, force_update=False, pad_to_len=None):
        """Panel order for tensor encoding.

        With a panel classifier + template name, panels sit at their class
        index and missing classes are `None` placeholders (empty panels);
        otherwise the spec's stored order is used. Optionally right-pads
        with `None` to `pad_to_len` (reference: pattern_converter.py:575-611).
        """
        if self.panel_classifier is None or self.template_name is None:
            order = super().panel_order(force_update=force_update)
        else:
            order = [None] * len(self.panel_classifier)
            for panel_name in self.pattern['panels']:
                class_idx = self.panel_classifier.class_idx(self.template_name, panel_name)
                order[class_idx] = panel_name

        if pad_to_len is not None:
            if pad_to_len < len(order):
                raise ValueError(
                    f'{self.__class__.__name__}::{self.name}::Error::requested max num of panels '
                    f'{pad_to_len} is smaller than evaluated number of panels {len(order)}')
            order = order + [None] * (pad_to_len - len(order))

        self.pattern['panel_order'] = order
        return order

    # ------------------- pattern -> tensors -------------------
    def pattern_as_tensors(self, pad_panels_to_len=None, pad_panels_num=None, pad_stitches_num=None,
                           with_placement=False, with_stitches=False, with_stitch_tags=False):
        """Encode the pattern as padded numpy tensors (see module docstring).

        Returns (outlines, num_edges_per_panel, num_panels[, rotations,
        translations][, stitches, num_stitches][, stitch_tags]).
        """
        panel_order = self.panel_order(pad_to_len=pad_panels_num)
        panel_lens = [
            len(self.pattern['panels'][name]['edges']) if name is not None else 0
            for name in panel_order
        ]
        max_len = pad_panels_to_len if pad_panels_to_len is not None else max(panel_lens)

        panel_seqs, panel_translations, panel_rotations = [], [], []
        for panel_name in panel_order:
            if panel_name is not None:
                edges, rot, transl = self.panel_as_numeric(panel_name, pad_to_len=max_len)
            else:
                edges, rot, transl = self._empty_panel(max_len)
            panel_seqs.append(edges)
            panel_rotations.append(rot)
            panel_translations.append(transl)

        stitches_list = self.pattern['stitches']
        stitches_num = len(stitches_list) if pad_stitches_num is None else pad_stitches_num
        if stitches_num < len(stitches_list):
            raise ValueError(
                f'{self.__class__.__name__}::Error::requested number of stitches {stitches_num} '
                f'is less than the number of stitches {len(stitches_list)} in pattern {self.name}')

        # zero-padded so the array can be used directly for indexing (callers
        # must mask the padded tail themselves)
        stitches_indices = np.zeros((2, stitches_num), dtype=np.int64)
        if with_stitch_tags:
            stitch_tags = self.stitches_as_tags()
            tags_per_edge = np.zeros((len(panel_seqs), max_len, 3))
        for idx, stitch in enumerate(stitches_list):
            for id_side, side in enumerate(stitch):
                panel_id = panel_order.index(side['panel'])
                edge_id = side['edge']
                stitches_indices[id_side][idx] = panel_id * max_len + edge_id
                if with_stitch_tags:
                    tags_per_edge[panel_id][edge_id] = stitch_tags[idx]

        result = [np.stack(panel_seqs), np.array(panel_lens)]
        result.append(len(self.pattern['panels']))
        if with_placement:
            result.append(np.stack(panel_rotations))
            result.append(np.stack(panel_translations))
        if with_stitches:
            result.append(stitches_indices)
            result.append(len(stitches_list))
        if with_stitch_tags:
            result.append(tags_per_edge)
        return tuple(result) if len(result) > 1 else result[0]

    def panel_as_numeric(self, panel_name, pad_to_len=None):
        """One panel as (edge sequence, quaternion, universal translation).

        Edges are additive vectors (each is the step from the previous vertex),
        so the sequence is origin-free; rotation is the panel euler rotation as
        an (x, y, z, w) quaternion; translation is the world position of the
        top-mid bounding-box point (reference: pattern_converter.py:189-226).
        """
        panel = self.pattern['panels'][panel_name]
        vertices = np.asarray(panel['vertices'], dtype=float)
        edge_sequence = [self._edge_as_vector(vertices, edge) for edge in panel['edges']]

        if pad_to_len is not None:
            if len(edge_sequence) > pad_to_len:
                raise ValueError(
                    f'{self.__class__.__name__}::{self.name}::panel {panel_name} cannot fit into '
                    f'requested length: {len(edge_sequence)} edges to fit into {pad_to_len}')
            pad = np.zeros_like(edge_sequence[0])
            edge_sequence.extend([pad] * (pad_to_len - len(edge_sequence)))

        translation, _ = self._panel_universal_transtation(panel_name)
        rotation = rot_tools.euler_xyz_to_quat(panel['rotation'])
        return np.stack(edge_sequence, axis=0), rotation, translation

    @staticmethod
    def _empty_panel(max_edge_num):
        """Placeholders for an absent panel class slot."""
        return np.zeros((max_edge_num, 4)), np.zeros(4), np.zeros(3)

    # ------------------- tensors -> pattern -------------------
    def pattern_from_tensors(self, pattern_representation, panel_rotations=None,
                             panel_translations=None, stitches=None, padded=False):
        """Rebuild the spec from (possibly padded) tensors. Units are cm.

        Mirrors the decode conventions of pattern_converter.py:118-187:
        panels with <3 non-padding edges are dropped; stitch entries (0, 0)
        are padding; stitches referring to dropped panels raise
        InvalidPatternDefError.
        """
        self._invalidate_all_values()
        self.properties.update(
            curvature_coords='relative',
            normalize_panel_translation=False,
            normalized_edge_loops=True,
            units_in_meter=100,  # cm
        )

        self.pattern['panels'] = {}
        in_panel_order = []
        new_panel_ids = [None] * len(pattern_representation)
        for idx in range(len(pattern_representation)):
            if self.panel_classifier is None:
                panel_name = 'panel_' + str(idx)
            else:
                panel_name = self.panel_classifier.class_name(idx)
            try:
                self.panel_from_numeric(
                    panel_name, pattern_representation[idx],
                    rotation=panel_rotations[idx] if panel_rotations is not None else None,
                    translation=panel_translations[idx] if panel_translations is not None else None,
                    padded=padded)
                in_panel_order.append(panel_name)
                new_panel_ids[idx] = len(in_panel_order) - 1
            except EmptyPanelError:
                pass  # empty slot in a padded pattern — move on

        self.pattern['panel_order'] = in_panel_order

        self.pattern['stitches'] = []
        if stitches is not None and len(stitches) > 0:
            if not padded:
                raise NotImplementedError(
                    f'{self.__class__.__name__}::recovering stitches for unpadded pattern is not supported')
            stitches = np.asarray(stitches)
            edges_per_panel = pattern_representation.shape[1]
            for stitch_id in range(stitches.shape[1]):
                if stitches[0][stitch_id] == 0 and stitches[1][stitch_id] == 0:
                    continue  # padding
                stitch_object = []
                for side_id in range(stitches.shape[0]):
                    pattern_edge_id = int(stitches[side_id][stitch_id])
                    in_panel_id = pattern_edge_id // edges_per_panel
                    if in_panel_id > (len(pattern_representation) - 1) or new_panel_ids[in_panel_id] is None:
                        raise InvalidPatternDefError(
                            self.name, f'stitch {stitch_id} refers to non-existing panel {in_panel_id}')
                    stitch_object.append({
                        'panel': in_panel_order[new_panel_ids[in_panel_id]],
                        'edge': int(pattern_edge_id % edges_per_panel),
                    })
                self.pattern['stitches'].append(stitch_object)
        else:
            print(f'{self.__class__.__name__}::Warning::{self.name}::panels updated but new stitches '
                  'info was not provided. Stitches are removed.')

    def panel_from_numeric(self, panel_name, edge_sequence, rotation=None, translation=None, padded=False):
        """Rebuild one panel from its (possibly padded) edge sequence.

        First vertex at origin; the loop is closed onto the origin when the
        final vertex lands within 3 cm per coordinate, otherwise an extra
        vertex is created (reference: pattern_converter.py:228-288).
        """
        edge_sequence = np.asarray(edge_sequence, dtype=float)
        if padded:
            selection = ~np.all(np.isclose(edge_sequence, 0, atol=1.5), axis=1)
            edge_sequence = edge_sequence[selection]
            if len(edge_sequence) < 3:
                raise EmptyPanelError(
                    f'{self.__class__.__name__}::EmptyPanelError::supplied <{panel_name}> is empty')

        if panel_name not in self.pattern['panels']:
            self.pattern['panels'][panel_name] = copy.deepcopy(panel_spec_template)

        vertices = np.array([[0.0, 0.0]])
        edges = []
        for idx in range(len(edge_sequence) - 1):
            edge_info = edge_sequence[idx]
            vertices = np.vstack([vertices, vertices[idx] + edge_info[:2]])
            edges.append(self._edge_dict(idx, idx + 1, edge_info[2:4]))

        # closing edge: snap to origin when close enough
        idx = len(vertices) - 1
        edge_info = edge_sequence[-1]
        fin_vert = vertices[-1] + edge_info[:2]
        if np.all(np.isclose(fin_vert, 0, atol=3)):  # 3 cm per coordinate tolerance
            edges.append(self._edge_dict(idx, 0, edge_info[2:4]))
        else:
            print(f'{self.__class__.__name__}::Warning::{self.name} panel {panel_name}::edge sequence '
                  'does not return to origin. Creating extra vertex')
            vertices = np.vstack([vertices, fin_vert])
            edges.append(self._edge_dict(idx, idx + 1, edge_info[2:4]))

        panel = self.pattern['panels'][panel_name]
        panel['vertices'] = vertices.tolist()
        panel['edges'] = edges

        if rotation is not None:
            panel['rotation'] = rot_tools.quat_to_euler_xyz(rotation).tolist()

        if translation is not None:
            # incoming translation is of the 3D top-mid point ('universal');
            # convert back to the panel-origin translation
            _, transl_origin = self._panel_universal_transtation(panel_name)
            shift = np.append(transl_origin, 0)
            rot_matrix = rot_tools.euler_xyz_to_matrix(panel['rotation'])
            panel['translation'] = (np.asarray(translation, dtype=float) - rot_matrix @ shift).tolist()

    @staticmethod
    def _edge_dict(vstart, vend, curvature):
        """Edge spec entry; curvature key only present when non-negligible."""
        edge_dict = {'endpoints': [int(vstart), int(vend)]}
        curvature = np.asarray(curvature, dtype=float)
        if not np.all(np.isclose(curvature, 0, atol=0.01)):
            edge_dict['curvature'] = curvature.tolist()
        return edge_dict

    # ------------------- stitch tags -------------------
    def stitches_as_tags(self):
        """Per-stitch 3D tag: the mean of the two participating edges' 3D
        midpoints — an approximate world location of the stitch
        (reference: pattern_converter.py:290-319)."""
        stitch_tags = []
        for stitch in self.pattern['stitches']:
            edge_tags = np.empty((2, 3))
            for side_idx, side in enumerate(stitch):
                panel = self.pattern['panels'][side['panel']]
                endpoint_ids = panel['edges'][side['edge']]['endpoints']
                endpoints = np.array([panel['vertices'][endpoint_ids[i]] for i in (0, 1)])
                edge_mid_2d = endpoints.mean(axis=0)
                edge_tags[side_idx] = self._point_in_3D(
                    edge_mid_2d, panel['rotation'], panel['translation'])
            stitch_tags.append(edge_tags.mean(axis=0))
        return np.array(stitch_tags)

    # ------------------- 3D edge pairs (stitch model IO) -------------------
    def _3D_edges_per_panel(self, randomize_direction=False, rng=None):
        """All edges as 8-float features (two 3D endpoints + 2 curvature),
        grouped per panel; optionally flips edge directions at random
        (with matching curvature flip cx -> 1-cx, cy -> -cy)."""
        if randomize_direction and rng is None:
            rng = np.random.default_rng()

        edges_3d = {}
        for panel_name in self.panel_order():
            if panel_name is None:
                continue
            edges_3d[panel_name] = []
            panel = self.pattern['panels'][panel_name]
            vertices_3d = self.panel_vertices_3d(panel_name)
            for edge_dict in panel['edges']:
                edge_verts = vertices_3d[edge_dict['endpoints']].copy()
                curvature = np.array(edge_dict['curvature'], dtype=float) \
                    if 'curvature' in edge_dict else np.zeros(2)
                if randomize_direction and rng.integers(2):
                    edge_verts = edge_verts[::-1].copy()
                    curvature[0] = 1 - curvature[0] if curvature[0] else 0
                    curvature[1] = -curvature[1]
                edges_3d[panel_name].append(np.concatenate([edge_verts.ravel(), curvature]))
        return edges_3d

    def stitches_as_3D_pairs(self, stitch_pairs_num=None, non_stitch_pairs_num=None,
                             randomize_edges=False, randomize_list_order=False, rng=None):
        """Training pairs for the stitch classifier: all stitched pairs (with
        duplication up to `stitch_pairs_num`) + random non-stitched pairs.
        Each pair is a 16-float vector; returns (pairs, bool mask)."""
        if stitch_pairs_num is not None and stitch_pairs_num < len(self.pattern['stitches']):
            raise ValueError(
                f'{self.__class__.__name__}::{self.name}::Error::requested fewer edge pairs '
                f'({stitch_pairs_num}) than there are stitches ({len(self.pattern["stitches"])})')
        if rng is None:
            rng = np.random.default_rng()

        edges_3d = self._3D_edges_per_panel(randomize_edges, rng=rng)

        pairs, mask = [], []
        stitched_pairs_ids = set()
        for stitch in self.pattern['stitches']:
            try:
                pair = [edges_3d[stitch[side]['panel']][stitch[side]['edge']] for side in (0, 1)]
            except IndexError:
                # can happen on (incorrectly) predicted panels
                print(f'Warning::{self.name}::missing edge while constructing stitch pairs')
                continue
            if randomize_edges and rng.integers(2):
                pair = [pair[1], pair[0]]
            pairs.append(np.concatenate(pair))
            mask.append(True)
            stitched_pairs_ids.add((
                (stitch[0]['panel'], stitch[0]['edge']),
                (stitch[1]['panel'], stitch[1]['edge']),
            ))

        # duplication needs at least one constructed pair: if every stitch hit
        # the missing-edge path above (badly predicted panels), fall through —
        # the non-stitched top-up below compensates for the shortfall
        if stitch_pairs_num is not None and len(stitched_pairs_ids) and \
                stitch_pairs_num > len(stitched_pairs_ids):
            for _ in range(len(stitched_pairs_ids), stitch_pairs_num):
                pairs.append(pairs[rng.integers(len(stitched_pairs_ids))])
                mask.append(True)

        if non_stitch_pairs_num is not None:
            panel_order = [p for p in self.panel_order() if p is not None]
            if stitch_pairs_num is not None and len(pairs) < stitch_pairs_num:
                non_stitch_pairs_num += stitch_pairs_num - len(pairs)
            for _ in range(non_stitch_pairs_num):
                while True:
                    pair_names, pair_edges = [], []
                    for _ in (0, 1):
                        pair_names.append(panel_order[rng.integers(len(panel_order))])
                        pair_edges.append(
                            int(rng.integers(len(self.pattern['panels'][pair_names[-1]]['edges']))))
                    if pair_names[0] == pair_names[1] and pair_edges[0] == pair_edges[1]:
                        continue
                    pair_id = ((pair_names[0], pair_edges[0]), (pair_names[1], pair_edges[1]))
                    if pair_id in stitched_pairs_ids or (pair_id[1], pair_id[0]) in stitched_pairs_ids:
                        continue
                    pairs.append(np.concatenate([
                        edges_3d[pair_names[0]][pair_edges[0]],
                        edges_3d[pair_names[1]][pair_edges[1]]]))
                    mask.append(False)
                    break

        pairs = np.stack(pairs)
        mask = np.array(mask, dtype=bool)
        if randomize_list_order:
            permutation = rng.permutation(len(pairs))
            return pairs[permutation], mask[permutation]
        return pairs, mask

    def all_edge_pairs(self):
        """Exhaustive cross-panel edge pairs (upper triangle of the panel
        grid; panels never stitch to themselves). Returns
        (pairs [M, 16], pair id mapping, GT stitched mask)."""
        edges_3d = self._3D_edges_per_panel()
        panel_order = [p for p in self.panel_order() if p is not None]
        stitch_set = self._stitches_as_set()

        pairs_blocks, pairs_mapping, mask = [], [], []
        for i in range(len(panel_order)):
            panel_i = panel_order[i]
            edges_i = np.array(edges_3d[panel_i])
            for j in range(i + 1, len(panel_order)):
                panel_j = panel_order[j]
                edges_j = np.array(edges_3d[panel_j])
                rows, cols = np.indices((len(edges_i), len(edges_j)))
                block = np.concatenate([edges_i[rows], edges_j[cols]], axis=-1)
                pairs_blocks.append(block.reshape(-1, block.shape[-1]))
                for row_idx in range(len(edges_i)):
                    for col_idx in range(len(edges_j)):
                        pair_id = ((panel_i, row_idx), (panel_j, col_idx))
                        pairs_mapping.append(pair_id)
                        mask.append(pair_id in stitch_set or (pair_id[1], pair_id[0]) in stitch_set)

        if not pairs_blocks:
            raise InvalidPatternDefError(self.name, 'No edges to construct')
        return np.concatenate(pairs_blocks).astype(np.float32), pairs_mapping, mask

    def _stitches_as_set(self):
        return {
            ((s[0]['panel'], s[0]['edge']), (s[1]['panel'], s[1]['edge']))
            for s in self.pattern['stitches']
        }

    # ------------------- stitches from a classifier -------------------
    def stitches_from_pair_classifier(self, predict_logits, data_stats):
        """Set this pattern's stitches from a pair-classifier.

        `predict_logits`: callable mapping standardized pairs (M, 16) numpy ->
        logits (M,) numpy. Edges participating in multiple predicted stitches
        keep only the highest-scoring one (reference:
        pattern_converter.py:411-456)."""
        self.pattern['stitches'] = []
        pairs, pairs_mapping, _ = self.all_edge_pairs()
        shift = np.asarray(data_stats['f_shift'], dtype=np.float32)
        scale = np.asarray(data_stats['f_scale'], dtype=np.float32)
        logits = np.asarray(predict_logits((pairs - shift) / scale)).reshape(-1)

        probability = 1.0 / (1.0 + np.exp(-logits))
        stitched_ids = np.flatnonzero(np.round(probability) > 0)

        for pair_idx in stitched_ids:
            edge_pair = pairs_mapping[pair_idx]
            self.pattern['stitches'].append(self._stitch_entry(
                edge_pair[0][0], edge_pair[0][1],
                edge_pair[1][0], edge_pair[1][1],
                score=float(logits[pair_idx])))

        # deduplicate: an edge may participate in at most one stitch.
        # NOTE: already-marked stitches keep participating in later
        # comparisons (a removed stitch can still knock out its weaker
        # conflicts) — this mirrors the reference's loop exactly
        # (pattern_converter.py:440-456), quirk included, for parity
        to_remove = set()
        stitches = self.pattern['stitches']
        for base_id in range(len(stitches)):
            base_stitch = stitches[base_id]
            for side in (0, 1):
                base_edge = base_stitch[side]
                for other_id in range(base_id + 1, len(stitches)):
                    curr = stitches[other_id]
                    if ((base_edge['panel'] == curr[0]['panel'] and base_edge['edge'] == curr[0]['edge'])
                            or (base_edge['panel'] == curr[1]['panel'] and base_edge['edge'] == curr[1]['edge'])):
                        to_remove.add(base_id if base_stitch[0]['score'] < curr[0]['score'] else other_id)
        if to_remove:
            self.pattern['stitches'] = [s for i, s in enumerate(stitches) if i not in to_remove]

    @staticmethod
    def _stitch_entry(panel_1, edge_1, panel_2, edge_2, score=None):
        return [
            {'panel': panel_1, 'edge': int(edge_1), 'score': score},
            {'panel': panel_2, 'edge': int(edge_2), 'score': score},
        ]
