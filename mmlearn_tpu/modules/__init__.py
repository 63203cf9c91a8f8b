"""Modules: encoders, layers, losses, metrics, schedulers, EMA."""

from mmlearn_tpu.modules.ema import ExponentialMovingAverage

__all__ = ["ExponentialMovingAverage"]
