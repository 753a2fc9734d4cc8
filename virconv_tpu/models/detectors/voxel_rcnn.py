"""VoxelRCNN meta-detector: voxelize -> VFE -> VirConv backbone -> BEV ->
RPN -> TED cascade head, as one jittable flax module.

Parity target ``/root/reference/pcdet/models/detectors/voxel_rcnn.py`` and
the module topology of ``detector3d_template.py:21-24``. Differences by
design: voxelization + mean/max VFE run fused on device (not in dataloader
workers); transform replicas ride the batch axis (entry = b * R + i); the
whole forward (and the training loss) is a single jitted function.

Expected batch pytree (produced by ``virconv_tpu.datasets`` collation):
    points        (B*R, P, 8)  float32   lidar (T/S) or fused (L) stream
    points_valid  (B*R, P)     bool
    points_mm / points_mm_valid           (T/S only, virtual-point stream)
    v2r, p2t      (B*R, 4, 3)  float32   calibration matrices
    trans_params  (B*R, 3) | None         world transform of each entry
    transform_param (B, R, 3) | None      test-time replica params
    gt_boxes      (B, M, 8), gt_valid (B, M)   train only
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ..backbones_2d.bev import BaseBEVBackbone, height_compression
from ..backbones_3d.virconv import VirConv8x, VirConvL8x
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..roi_heads.ted_head import TEDMHead


class VoxelRCNN(nn.Module):
    model_cfg: Any
    dataset_cfg: Any
    num_class: int = 1

    def setup(self):
        from ...config import CfgNode
        # flax freezes dict attributes (including re-assignments), so wrap
        # into CfgNode locally at each use site
        mcfg = CfgNode(self.model_cfg)
        dcfg = CfgNode(self.dataset_cfg)
        self.pcr = tuple(dcfg.POINT_CLOUD_RANGE)
        proc = [p for p in dcfg.DATA_PROCESSOR
                if p['NAME'] == 'transform_points_to_voxels'][0]
        self.voxel_size = tuple(proc.VOXEL_SIZE)
        self.max_pts_per_voxel = proc.MAX_POINTS_PER_VOXEL
        self.max_voxels = dict(proc.MAX_NUMBER_OF_VOXELS)
        self.grid_size = tuple(
            int(round((self.pcr[i + 3] - self.pcr[i]) / self.voxel_size[i]))
            for i in range(3))

        bcfg = mcfg.BACKBONE_3D
        self.is_mm = bcfg.get('MM', False)
        common = dict(num_filters=tuple(bcfg.NUM_FILTERS),
                      out_features=bcfg.OUT_FEATURES,
                      layer_discard_rate=bcfg.LAYER_DISCARD_RATE,
                      voxel_size=self.voxel_size,
                      point_cloud_range=self.pcr)
        if bcfg.NAME == 'VirConv8x':
            self.backbone = VirConv8x(**common)
        elif bcfg.NAME == 'VirConvL8x':
            self.backbone = VirConvL8x(**common)
        else:
            raise NotImplementedError(bcfg.NAME)

        b2 = mcfg.BACKBONE_2D
        self.bev_backbone = BaseBEVBackbone(
            layer_nums=tuple(b2.LAYER_NUMS),
            layer_strides=tuple(b2.LAYER_STRIDES),
            num_filters=tuple(b2.NUM_FILTERS),
            upsample_strides=tuple(b2.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(b2.NUM_UPSAMPLE_FILTERS))

        dh = mcfg.DENSE_HEAD
        rnms = mcfg.ROI_HEAD.NMS_CONFIG
        self.dense_head_train_nms = dict(
            pre=rnms.TRAIN.NMS_PRE_MAXSIZE, post=rnms.TRAIN.NMS_POST_MAXSIZE,
            thresh=rnms.TRAIN.NMS_THRESH)
        self.dense_head_test_nms = dict(
            pre=rnms.TEST.NMS_PRE_MAXSIZE, post=rnms.TEST.NMS_POST_MAXSIZE,
            thresh=rnms.TEST.NMS_THRESH)
        self.dense_head = AnchorHeadSingle(
            model_cfg=dh, num_class=self.num_class,
            grid_size=self.grid_size[:2], point_cloud_range=self.pcr,
            name='dense_head')

        rh = mcfg.ROI_HEAD
        nf = tuple(bcfg.NUM_FILTERS)
        self.roi_head = TEDMHead(
            model_cfg=rh, num_class=self.num_class, rot_num=rh.ROT_NUM,
            voxel_size=self.voxel_size, point_cloud_range=self.pcr,
            input_channels={'x_conv3': nf[2], 'x_conv4': nf[3]},
            name='roi_head')

    def _voxelize(self, points, valid, n_entries, mode, indicator_max):
        p = points.reshape(-1, points.shape[-1])
        m = valid.reshape(-1)
        bidx = jnp.repeat(jnp.arange(n_entries, dtype=jnp.int32),
                          points.shape[1])
        st = sp.voxelize(p, m, self.pcr, self.voxel_size,
                         max_voxels=self.max_voxels[mode] * n_entries,
                         max_points_per_voxel=self.max_pts_per_voxel,
                         batch_size=n_entries, batch_idx=bidx,
                         indicator_max=indicator_max)
        # +1 z padding like the reference sparse_shape (grid[::-1] + [1,0,0])
        d, h, w = st.spatial_shape
        return st.replace(spatial_shape=(d + 1, h, w))

    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 stage: str | None = None):
        """Full detector forward. ``stage`` ('voxelize'/'backbone'/'bev'/
        'rpn') returns a scalar probe right after that stage — XLA dead-code
        eliminates everything downstream, giving exact prefix timings for
        stage attribution (tools/profile_stages.py)."""
        from ...config import CfgNode
        mcfg = CfgNode(self.model_cfg)
        points = batch['points']
        n_entries = points.shape[0]
        tp = batch.get('transform_param')
        n_rep = tp.shape[1] if tp is not None else 1
        b = n_entries // n_rep
        mode = 'train' if train else 'test'

        vfe_model = mcfg.VFE.get('MODEL', None)
        st = self._voxelize(points, batch['points_valid'], n_entries, mode,
                            indicator_max=(vfe_model == 'max'))

        trans_params = batch.get('trans_params')
        if stage == 'voxelize':
            probe = st.feats.sum()
            if self.is_mm:
                st_mm = self._voxelize(batch['points_mm'],
                                       batch['points_mm_valid'], n_entries,
                                       mode, indicator_max=False)
                probe = probe + st_mm.feats.sum()
            return {'probe': probe}
        if self.is_mm:
            st_mm = self._voxelize(batch['points_mm'],
                                   batch['points_mm_valid'], n_entries, mode,
                                   indicator_max=False)
            bb_out = self.backbone(st, st_mm, batch['v2r'], batch['p2t'],
                                   trans_params, train)
            feats_mm = bb_out['multi_scale_3d_features_mm']
        else:
            bb_out = self.backbone(st, batch['v2r'], batch['p2t'],
                                   trans_params, train)
            feats_mm = bb_out['multi_scale_3d_features']
        feats_lidar = bb_out['multi_scale_3d_features']
        strides = bb_out['multi_scale_3d_strides']
        if stage == 'backbone':
            return {'probe':
                    bb_out['encoded_spconv_tensor'].feats.sum()
                    + feats_lidar['x_conv3'].feats.sum()
                    + feats_lidar['x_conv4'].feats.sum()
                    + feats_mm['x_conv3'].feats.sum()
                    + feats_mm['x_conv4'].feats.sum()}

        # BEV path uses replica 0 only (reference: suffix-less keys).
        # Select replica-0 rows in sparse form before densifying.
        enc = bb_out['encoded_spconv_tensor']
        if n_rep > 1:
            keep = enc.mask & (enc.coords[:, 0] % n_rep == 0)
            new_coords = enc.coords.at[:, 0].set(enc.coords[:, 0] // n_rep)
            enc = enc.replace(
                coords=jnp.where(keep[:, None], new_coords, -1),
                feats=jnp.where(keep[:, None], enc.feats, 0.0),
                mask=keep, batch_size=b)
        bev = height_compression(enc)
        bev_feats = self.bev_backbone(bev, train)
        if stage == 'bev':
            return {'probe': bev_feats.sum()}

        # anchor mask source: replica-0 points of the whole batch
        pts0 = points.reshape(b, n_rep, *points.shape[1:])[:, 0]
        pv0 = batch['points_valid'].reshape(b, n_rep, -1)[:, 0]
        points_xy = pts0[..., 0:2].reshape(-1, 2)
        points_mask = pv0.reshape(-1)

        nms_cfg = (self.dense_head_train_nms if train
                   else self.dense_head_test_nms)
        rpn_out = self.dense_head(bev_feats, points_xy, points_mask, nms_cfg,
                                  gt_boxes=batch.get('gt_boxes'),
                                  gt_valid=batch.get('gt_valid'), train=train)

        if stage == 'rpn':
            return {'probe': rpn_out['rois'].sum()
                    + rpn_out['roi_scores'].sum()}
        if stage is not None and stage.startswith(('pool', 'stage')):
            return self.roi_head(
                feats_lidar, feats_mm, strides,
                {'rois': rpn_out['rois'], 'roi_scores': rpn_out['roi_scores'],
                 'roi_labels': rpn_out['roi_labels'],
                 'roi_valid': rpn_out['roi_valid']},
                bev_feats, tp, batch.get('gt_boxes'), batch.get('gt_valid'),
                train, probe_stage=stage)
        roi_out = self.roi_head(
            feats_lidar, feats_mm, strides,
            {'rois': rpn_out['rois'], 'roi_scores': rpn_out['roi_scores'],
             'roi_labels': rpn_out['roi_labels'],
             'roi_valid': rpn_out['roi_valid']},
            bev_feats, tp, batch.get('gt_boxes'), batch.get('gt_valid'),
            train)

        out = {'batch_box_preds': roi_out['batch_box_preds'],
               'batch_cls_preds': roi_out['batch_cls_preds'],
               'roi_valid': roi_out['roi_valid'],
               'rois': rpn_out['rois']}

        if train:
            lw = mcfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
            rpn_loss, rpn_tb = self.dense_head.loss(
                rpn_out, lw, lw['code_weights'])
            rlw = mcfg.ROI_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
            rcnn_loss, rcnn_tb = self.roi_head.loss(
                roi_out['stage_targets'], rlw, rlw['code_weights'])
            out['loss'] = rpn_loss + rcnn_loss
            out['tb'] = {**rpn_tb, **rcnn_tb}
        return out
