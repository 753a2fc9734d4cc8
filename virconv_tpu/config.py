"""YAML config system with recursive ``_BASE_CONFIG_`` merge and CLI overrides.

Mirrors the public surface of the reference config loader
(``/root/reference/pcdet/config.py:1-104``): configs are attribute-accessible
nested dicts loaded from YAML, a ``_BASE_CONFIG_`` key pulls in and merges a
base file, and ``cfg_from_list`` applies dotted-path ``--set KEY VALUE``
overrides. Implemented without external deps (easydict is not available).
"""

from pathlib import Path

import yaml


class CfgNode(dict):
    """A dict with attribute access, recursively converting nested dicts."""

    def __init__(self, d=None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = self._convert(v)

    @classmethod
    def _convert(cls, v):
        from collections.abc import Mapping
        if isinstance(v, CfgNode):
            return v
        if isinstance(v, Mapping):
            return cls(dict(v))
        if isinstance(v, (list, tuple)):
            return [cls._convert(x) for x in v]
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = self._convert(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._convert(value))

    def __deepcopy__(self, memo):
        import copy

        out = CfgNode()
        for k, v in self.items():
            dict.__setitem__(out, k, copy.deepcopy(v, memo))
        return out


def merge_new_config(config, new_config):
    """Recursively merge ``new_config`` into ``config`` (in place).

    A ``_BASE_CONFIG_`` entry is resolved relative to the repo root or CWD and
    merged first, so the derived file's keys win.
    """
    if '_BASE_CONFIG_' in new_config:
        base_rel = new_config['_BASE_CONFIG_']
        for root in (Path.cwd(), ROOT_DIR, ROOT_DIR / 'tools'):
            cand = root / base_rel
            if cand.exists():
                with open(cand, 'r') as f:
                    merge_new_config(config, yaml.safe_load(f))
                break
        else:
            raise FileNotFoundError(f'_BASE_CONFIG_ not found: {base_rel}')

    for key, val in new_config.items():
        if key == '_BASE_CONFIG_':
            continue
        if isinstance(val, dict):
            if key not in config or not isinstance(config.get(key), dict):
                config[key] = CfgNode()
            merge_new_config(config[key], val)
        else:
            config[key] = CfgNode._convert(val)
    return config


def cfg_from_yaml_file(cfg_file, config=None):
    config = cfg if config is None else config
    with open(cfg_file, 'r') as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config, new_config)
    config.TAG = Path(cfg_file).stem
    config.EXP_GROUP_PATH = '/'.join(str(cfg_file).split('/')[1:-1])
    return config


def _parse_value(value):
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def cfg_from_list(cfg_list, config=None):
    """Apply dotted-path overrides, e.g. ``['MODEL.NAME', 'VoxelRCNN']``."""
    config = cfg if config is None else config
    assert len(cfg_list) % 2 == 0, 'override list must be key/value pairs'
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        keys = full_key.split('.')
        d = config
        for sub in keys[:-1]:
            assert sub in d, f'unknown config key: {full_key}'
            d = d[sub]
        key = keys[-1]
        value = _parse_value(v)
        if key in d and isinstance(d[key], tuple(type(x) for x in (0, 0.0, ''))):
            assert isinstance(value, type(d[key])) or d[key] is None, \
                f'type mismatch for {full_key}'
        d[key] = value
    return config


def log_config_to_file(config, pre='cfg', logger=None):
    for key, val in config.items():
        if isinstance(val, dict):
            logger.info('----------- %s -----------' % key)
            log_config_to_file(val, pre=pre + '.' + key, logger=logger)
            continue
        logger.info('%s.%s: %s' % (pre, key, val))


ROOT_DIR = Path(__file__).resolve().parent.parent
cfg = CfgNode()
cfg.ROOT_DIR = ROOT_DIR
cfg.LOCAL_RANK = 0
