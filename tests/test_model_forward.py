"""End-to-end model smoke tests on a tiny synthetic scene (CPU).

Builds VirConv-T/L-style detectors with a shrunken grid and checks that
train forward returns a finite loss and eval forward returns boxes, with
transform replicas on the batch axis at eval.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from virconv_tpu.config import CfgNode
from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
from virconv_tpu.utils.calibration import identity_calib
from virconv_tpu.utils import transforms as tr


def tiny_cfg(mm=True):
    stage = {
        'ROI_PER_IMAGE': 32, 'FG_RATIO': 0.5,
        'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'roi_iou_x',
        'CLS_FG_THRESH': [0.75], 'CLS_BG_THRESH': [0.25],
        'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
        'REG_FG_THRESH': [0.5], 'ENABLE_HARD_SAMPLING': True,
        'HARD_SAMPLING_THRESH': [0.5], 'HARD_SAMPLING_RATIO': [0.5],
    }
    pool = {
        'FEATURES_SOURCE': ['x_conv3', 'x_conv4'],
        'PRE_MLP': True, 'GRID_SIZE': 4,
        'POOL_LAYERS': {
            'x_conv3': {'MLPS': [[16, 16], [16, 16]],
                        'QUERY_RANGES': [[2, 2, 2], [3, 3, 3]],
                        'POOL_RADIUS': [0.8, 1.6], 'NSAMPLE': [8, 8],
                        'POOL_METHOD': 'max_pool'},
            'x_conv4': {'MLPS': [[16, 16], [16, 16]],
                        'QUERY_RANGES': [[2, 2, 2], [3, 3, 3]],
                        'POOL_RADIUS': [1.6, 3.2], 'NSAMPLE': [8, 8],
                        'POOL_METHOD': 'max_pool'},
        },
    }
    model = {
        'NAME': 'VoxelRCNN',
        'VFE': {'NAME': 'MeanVFE', 'MODEL': 'max'},
        'BACKBONE_3D': {
            'NAME': 'VirConv8x' if mm else 'VirConvL8x',
            'NUM_FILTERS': [8, 16, 32, 32], 'OUT_FEATURES': 32,
            'MM': mm, 'LAYER_DISCARD_RATE': 0.15,
            'RETURN_NUM_FEATURES_AS_DICT': True,
        },
        'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 64},
        'BACKBONE_2D': {
            'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [2, 2],
            'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
            'UPSAMPLE_STRIDES': [1, 2], 'NUM_UPSAMPLE_FILTERS': [32, 32],
        },
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
            'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [{
                'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                'anchor_rotations': [0, 1.57],
                'anchor_bottom_heights': [-1.78], 'align_center': False,
                'feature_map_stride': 8, 'matched_threshold': 0.6,
                'unmatched_threshold': 0.45,
            }],
            'TARGET_ASSIGNER_CONFIG': {
                'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
                'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
                'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder',
            },
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'ROI_HEAD': {
            'NAME': 'TEDMHead', 'CLASS_AGNOSTIC': True, 'ROT_NUM': 2,
            'PART': {'IN_CHANNEL': 64, 'SIZE': 7, 'GRID_OFFSETS': [0., 8.],
                     'FEATMAP_STRIDE': 0.8},
            'SHARED_FC': [64, 64], 'CLS_FC': [64, 64], 'REG_FC': [64, 64],
            'DP_RATIO': 0.01,
            'NMS_CONFIG': {
                'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                          'NMS_PRE_MAXSIZE': 128, 'NMS_POST_MAXSIZE': 64,
                          'NMS_THRESH': 0.8},
                'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                         'NMS_PRE_MAXSIZE': 128, 'NMS_POST_MAXSIZE': 32,
                         'NMS_THRESH': 0.75},
            },
            'ROI_GRID_POOL': pool, 'ROI_GRID_POOL_MM': pool,
            'TARGET_CONFIG': {'BOX_CODER': 'ResidualCoder',
                              'STAGE0': stage, 'STAGE1': stage},
            'LOSS_CONFIG': {
                'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
                'CORNER_LOSS_REGULARIZATION': True,
                'GRID_3D_IOU_LOSS': False,
                'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0,
                                 'rcnn_reg_weight': 1.0,
                                 'rcnn_corner_weight': 1.0,
                                 'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {'SCORE_THRESH': 0.4, 'IoU': 0.9, 'RL': True},
    }
    data = {
        'POINT_CLOUD_RANGE': [0, -8, -3, 16, 8, 1],
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range'},
            {'NAME': 'shuffle_points'},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.1, 0.1, 0.1], 'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 2048, 'test': 2048}},
        ],
    }
    return CfgNode(model), CfgNode(data)


def shrink_cfg(model_cfg, data_cfg):
    """Width-shrunk preset of the tiny config (same graph structure,
    smaller widths) — shared by the driver's dryrun_multichip
    (__graft_entry__), the always-on 8-device smoke, and the always-on
    band-integration variant, so one definition guards preset drift.
    Returns the suggested n_pts for batches of this preset."""
    b3 = model_cfg.BACKBONE_3D
    b3.NUM_FILTERS = [8, 8, 16, 16]
    b3.OUT_FEATURES = 16
    model_cfg.MAP_TO_BEV.NUM_BEV_FEATURES = 32
    b2 = model_cfg.BACKBONE_2D
    b2.NUM_FILTERS = [16, 32]
    b2.NUM_UPSAMPLE_FILTERS = [16, 16]
    model_cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.SAMPLE_SIZE = 256
    rh = model_cfg.ROI_HEAD
    rh.PART.IN_CHANNEL = 32
    rh.SHARED_FC = [32, 32]
    rh.CLS_FC = [32, 32]
    rh.REG_FC = [32, 32]
    rh.NMS_CONFIG.TRAIN.NMS_PRE_MAXSIZE = 64
    rh.NMS_CONFIG.TRAIN.NMS_POST_MAXSIZE = 16
    rh.NMS_CONFIG.TEST.NMS_PRE_MAXSIZE = 64
    rh.NMS_CONFIG.TEST.NMS_POST_MAXSIZE = 16
    for s in ('STAGE0', 'STAGE1'):
        rh.TARGET_CONFIG[s].ROI_PER_IMAGE = 16
    for pool_key in ('ROI_GRID_POOL', 'ROI_GRID_POOL_MM'):
        p = rh[pool_key]
        p.GRID_SIZE = 3
        for lc in p.POOL_LAYERS.values():
            lc.QUERY_RANGES = [[1, 1, 1], [2, 2, 2]]
            lc.NSAMPLE = [4, 4]
            lc.MLPS = [[8, 8], [8, 8]]
    data_cfg.DATA_PROCESSOR[2].MAX_NUMBER_OF_VOXELS = {
        'train': 1024, 'test': 1024}
    return 512


def make_batch(rng, n_entries=1, n_pts=1500, train=True, n_rep=1):
    pcr = [0, -8, -3, 16, 8, 1]
    calib = identity_calib(fu=200.0, fv=200.0, cu=700.0, cv=300.0)
    v2r, p2t = calib.device_matrices()
    pts = rng.uniform([pcr[0], pcr[1], pcr[2], 0, 0, 0, 0, 1],
                      [pcr[3], pcr[4], pcr[5], 1, 1, 1, 1, 2.01],
                      (n_entries, n_pts, 8)).astype(np.float32)
    pts[..., 7] = np.round(pts[..., 7])
    valid = np.ones((n_entries, n_pts), bool)
    valid[:, -50:] = False
    gt = np.zeros((n_entries // n_rep, 6, 8), np.float32)
    gt[:, 0] = [4, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [10, 3, -1, 3.9, 1.6, 1.56, -0.5, 1]
    gt_valid = np.zeros((n_entries // n_rep, 6), bool)
    gt_valid[:, :2] = True
    batch = {
        'points': jnp.asarray(pts),
        'points_valid': jnp.asarray(valid),
        'points_mm': jnp.asarray(pts),
        'points_mm_valid': jnp.asarray(valid),
        'v2r': jnp.asarray(np.tile(v2r, (n_entries, 1, 1))),
        'p2t': jnp.asarray(np.tile(p2t, (n_entries, 1, 1))),
        'gt_boxes': jnp.asarray(gt), 'gt_valid': jnp.asarray(gt_valid),
    }
    if train:
        batch['trans_params'] = jnp.tile(
            jnp.asarray([[0.1, 1.0, 1.01]], jnp.float32), (n_entries, 1))
        batch['transform_param'] = None
    else:
        params = np.array([[0.3, 0.0, 0.98], [0.3, 1.0, 1.02]],
                          np.float32)[:n_rep]
        batch['transform_param'] = jnp.asarray(
            np.tile(params[None], (n_entries // n_rep, 1, 1)))
        batch['trans_params'] = jnp.asarray(
            np.tile(params, (n_entries // n_rep, 1)))
    return batch


@pytest.mark.parametrize('mm', [True, False])
def test_train_forward_loss_finite(mm):
    model_cfg, data_cfg = tiny_cfg(mm=mm)
    model = VoxelRCNN(model_cfg=model_cfg, dataset_cfg=data_cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, n_entries=2, train=True)
    import functools
    init = jax.jit(functools.partial(model.init, train=True))
    variables = init(
        {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
         'sampling': jax.random.PRNGKey(2), 'dropout': jax.random.PRNGKey(3)},
        batch)
    apply = jax.jit(functools.partial(model.apply, train=True,
                                      mutable=['batch_stats']))
    out, _ = apply(
        variables, batch,
        rngs={'stvd': jax.random.PRNGKey(4),
              'sampling': jax.random.PRNGKey(5),
              'dropout': jax.random.PRNGKey(6)})
    loss = float(out['loss'])
    assert np.isfinite(loss), loss
    assert out['batch_box_preds'].shape[-1] == 7


def test_eval_forward_with_replicas():
    model_cfg, data_cfg = tiny_cfg(mm=True)
    model = VoxelRCNN(model_cfg=model_cfg, dataset_cfg=data_cfg)
    rng = np.random.default_rng(1)
    import functools
    train_batch = make_batch(rng, n_entries=1, train=True)
    init = jax.jit(functools.partial(model.init, train=True))
    variables = init(
        {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
         'sampling': jax.random.PRNGKey(2), 'dropout': jax.random.PRNGKey(3)},
        train_batch)
    eval_batch = make_batch(rng, n_entries=2, train=False, n_rep=2)
    out = jax.jit(functools.partial(model.apply, train=False))(
        variables, eval_batch)
    boxes = np.asarray(out['batch_box_preds'])
    scores = np.asarray(out['batch_cls_preds'])
    assert boxes.shape[0] == 1 and boxes.shape[-1] == 7
    assert scores.shape[:2] == boxes.shape[:2]
    assert np.isfinite(boxes).all() and np.isfinite(scores).all()


def test_stage_probes():
    """The profiling stage probes (tools/profile_stages.py) must return a
    finite scalar at every prefix and dead-code-eliminate downstream work
    (shape/validity only here; timing attribution runs on the chip)."""
    import functools
    model_cfg, data_cfg = tiny_cfg(mm=True)
    model = VoxelRCNN(model_cfg=model_cfg, dataset_cfg=data_cfg)
    rng = np.random.default_rng(2)
    train_batch = make_batch(rng, n_entries=1, train=True)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
         'sampling': jax.random.PRNGKey(2), 'dropout': jax.random.PRNGKey(3)},
        train_batch)
    eval_batch = make_batch(rng, n_entries=2, train=False, n_rep=2)
    for stage in ('voxelize', 'backbone', 'bev', 'rpn', 'pool0', 'stage0'):
        out = jax.jit(functools.partial(model.apply, train=False,
                                        stage=stage))(variables, eval_batch)
        assert set(out) == {'probe'}, stage
        assert np.isfinite(float(out['probe'])), stage
