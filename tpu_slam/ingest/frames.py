"""Frame graph of the rotating 3D scanner — the TF chain as pure functions.

Replaces the reference's two TF publishers with one composable kinematic
model:

  * encoder node (m3d/m3dunit_base/src/encoder_node_li.cpp:87-109): the
    dynamic ``m3d_link -> m3d_rot_laser_link`` transform — fixed lever arm
    (-0.0835, 0, 0.1835) and rotation RPY(0, -pi/2, angle);
  * transformBroadcaster.py:126-141: the static sensor-model offset
    (``m3d_rot_laser_link_uncalibrated -> rot_laser_optical``) and the
    persisted calibration link
    (``m3d_rot_laser_link -> m3d_rot_laser_link_uncalibrated``).

The full chain maps laser-frame points into the unit base frame:

    T_base_laser(angle) = T_rot(angle) @ T_calib @ T_sensor

Encoder semantics preserved (SURVEY.md §7.4 item 5, driverLib.cpp:202-241):
angle = -2*pi*(ticks mod enc_res)/enc_res with enc_res = 4 * hardware value;
the applied angle subtracts a homing offset (encoder_node_li.cpp:98,
offset defaults to pi via the launch param chain).

All transform math is jnp so the chain can be evaluated in-jit for whole
batches of scan lines at once (one (L, 4, 4) tensor per aggregation window).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_slam.core import se3

# Sensor-model mounting offsets (translation xyz, quaternion xyzw), matching
# the constant tables in transformBroadcaster.py:10-19.
SENSOR_MODELS: Dict[str, Tuple[Tuple[float, float, float],
                               Tuple[float, float, float, float]]] = {
    "TIM500": ((0.0, 0.0035, 0.0), (0.0, 0.0, 0.0, 1.0)),
    "LMS100": ((0.074, 0.0, 0.068), (0.0, 0.0, 0.0, 1.0)),
    "LMS100C": ((0.0, 0.0, 0.068), (0.0, 0.0, 0.0, 1.0)),
    "VLP16": ((0.0, 0.0035, 0.0), (0.0, 0.0, -0.7071068, 0.7071068)),
}

# Rotating-unit lever arm: origin of the rotating laser link in the unit base
# frame (encoder_node_li.cpp:89-90).
ROT_LINK_TRANSLATION = (-0.0835, 0.0, 0.1835)
# Front (static) laser link offset (encoder_node_li.cpp:83-85).
FRONT_LINK_TRANSLATION = (0.0285, 0.0, 0.04)


@dataclasses.dataclass(frozen=True)
class SensorModel:
    """Static mounting description of a supported laser."""

    name: str
    translation: Tuple[float, float, float]
    orientation_xyzw: Tuple[float, float, float, float]

    @staticmethod
    def by_name(name: str) -> "SensorModel":
        if name not in SENSOR_MODELS:
            raise KeyError(f"unknown sensor model {name!r}; "
                           f"known: {sorted(SENSOR_MODELS)}")
        t, q = SENSOR_MODELS[name]
        return SensorModel(name=name, translation=t, orientation_xyzw=q)

    def transform(self, dtype=jnp.float32) -> jax.Array:
        R = se3.quat_to_matrix(jnp.asarray(self.orientation_xyzw, dtype))
        return se3.from_rt(R, jnp.asarray(self.translation, dtype))


@dataclasses.dataclass
class Calibration:
    """The persisted 6-DoF laser calibration offset.

    JSON on disk is ``[[tx,ty,tz],[qx,qy,qz,qw]]`` — identical to the
    reference's m3d_calibration.yaml (transformBroadcaster.py:25-60), so
    calibrations migrate between the two stacks unchanged.
    """

    translation: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    orientation_xyzw: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)

    @staticmethod
    def default_path() -> str:
        home = os.environ.get("ROS_HOME") or os.path.join(
            os.environ.get("HOME", "."), ".ros")
        return os.path.join(home, "m3d_calibration.yaml")

    @staticmethod
    def load(path: Optional[str] = None) -> "Calibration":
        """Load, creating an identity file if absent (reference behavior)."""
        path = path or Calibration.default_path()
        try:
            with open(path) as f:
                matrix = json.load(f)
        except (OSError, json.JSONDecodeError):
            matrix = [[0, 0, 0], [0, 0, 0, 1]]
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                json.dump(matrix, f)
        return Calibration(translation=tuple(matrix[0]),
                           orientation_xyzw=tuple(matrix[1]))

    def save(self, path: Optional[str] = None) -> str:
        path = path or Calibration.default_path()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump([list(self.translation), list(self.orientation_xyzw)], f)
        return path

    def transform(self, dtype=jnp.float32) -> jax.Array:
        R = se3.quat_to_matrix(jnp.asarray(self.orientation_xyzw, dtype))
        return se3.from_rt(R, jnp.asarray(self.translation, dtype))


def encoder_ticks_to_angle(ticks: jax.Array, enc_res: int) -> jax.Array:
    """Raw encoder counts -> rotation angle in radians.

    angle = -2*pi*(ticks mod enc_res)/enc_res, enc_res = 4 * hardware res
    (driverLib.cpp:202-217, :230-241).
    """
    value = jnp.mod(ticks, enc_res)
    return -2.0 * jnp.pi * value.astype(jnp.float32) / enc_res


def rotation_link_transform(angle: jax.Array) -> jax.Array:
    """Dynamic unit-base -> rotating-laser-link transform at encoder ``angle``.

    RPY(0, -pi/2, angle) about the lever arm (encoder_node_li.cpp:89-104).
    Batched: ``jax.vmap`` lifts it to (L,) angles -> (L, 4, 4).
    """
    q = se3.quat_from_euler(jnp.zeros_like(angle),
                            jnp.full_like(angle, -0.5 * jnp.pi), angle)
    R = se3.quat_to_matrix(q)
    t = jnp.asarray(ROT_LINK_TRANSLATION, dtype=R.dtype)
    return se3.from_rt(R, t)


def front_laser_transform(sensor: Optional[SensorModel] = None
                          ) -> jax.Array:
    """Static unit-base -> front-laser transform.

    The reference's second (front-facing, non-rotating) SICK: its link TF
    is published at the fixed FRONT_LINK_TRANSLATION lever arm
    (encoder_node_li.cpp:83-85), composed with the sensor-model mounting
    offset exactly like the rotating laser's static tail. Used by the live
    pipeline's second laser stream (pipeline.live.LivePipeline.front).
    """
    t = jnp.asarray(FRONT_LINK_TRANSLATION, jnp.float32)
    T = se3.from_rt(jnp.eye(3, dtype=jnp.float32), t)
    if sensor is not None:
        T = se3.compose(T, sensor.transform())
    return T


@dataclasses.dataclass(frozen=True)
class FrameChain:
    """The composed laser-to-base kinematic chain.

    ``T_base_laser(angle) = T_rot(angle) @ T_calib @ T_sensor`` with the
    static tail precomputed once. ``encoder_offset`` reproduces the
    reference's homing-offset subtraction (encoder_node_li.cpp:41-43,98 —
    default pi).
    """

    sensor: SensorModel
    calibration: Calibration = dataclasses.field(default_factory=Calibration)
    encoder_offset: float = math.pi

    def static_tail(self) -> jax.Array:
        return se3.compose(self.calibration.transform(),
                           self.sensor.transform())

    def base_from_laser(self, angle: jax.Array) -> jax.Array:
        """(…,) encoder angles -> (…, 4, 4) base<-laser transforms."""
        tail = self.static_tail()
        a = jnp.asarray(angle, jnp.float32) - self.encoder_offset
        if a.ndim == 0:
            return se3.compose(rotation_link_transform(a), tail)
        return jax.vmap(
            lambda x: se3.compose(rotation_link_transform(x), tail))(a)


class EncoderHistory:
    """Thread-safe (time, angle) ring with linear interpolation.

    The reference joins the laser and encoder streams by interpolating the
    TF buffer at each scan line's timestamp (m3d_aggregator.cpp:261-262);
    sampling the encoder at line *arrival* instead skews every line by the
    angle swept during transport and polling (r3 verdict missing #3).
    A producer thread pushes samples; ``at(t)`` interpolates between the
    two bracketing samples.  Angles are UNWRAPPED on push (each sample is
    brought within pi of the previous one) so interpolation crosses the
    2-pi seam of the encoder model (driverLib.cpp:202-217) correctly.
    """

    def __init__(self, capacity: int = 2048):
        import collections
        import threading
        self._t = collections.deque(maxlen=capacity)
        self._a = collections.deque(maxlen=capacity)
        self._lock = threading.Lock()

    def push(self, t: float, angle: float) -> None:
        two_pi = 2.0 * math.pi
        with self._lock:
            if self._a:
                last = self._a[-1]
                while angle - last > math.pi:
                    angle -= two_pi
                while angle - last < -math.pi:
                    angle += two_pi
            self._t.append(float(t))
            self._a.append(float(angle))

    def __len__(self) -> int:
        with self._lock:
            return len(self._t)

    def newest_t(self) -> float:
        """Time of the newest sample (-inf when empty) — lets a consumer
        wait for a bracketing sample before interpolating."""
        with self._lock:
            return self._t[-1] if self._t else float("-inf")

    def at(self, t: float) -> float:
        """Unwrapped angle at time ``t``.

        Queries inside the sampled span interpolate linearly between the
        bracketing samples. Queries slightly PAST the newest sample
        extrapolate along the last two samples' slope (bounded to 50 ms) —
        in steady state the consumer asks at line-arrival time, which is
        almost always a fraction of a sampler period newer than the last
        sample, and clamping there degrades interpolation to a zero-order
        hold with one period of angular lag (r4 advisor finding #5).
        Queries before the first sample clamp to it.
        """
        import bisect
        with self._lock:
            if not self._t:
                raise ValueError("EncoderHistory is empty")
            ts = tuple(self._t)
            an = tuple(self._a)
        i = bisect.bisect_left(ts, t)
        if i <= 0:
            return an[0]
        if i >= len(ts):
            if len(ts) >= 2 and ts[-1] > ts[-2]:
                slope = (an[-1] - an[-2]) / (ts[-1] - ts[-2])
                return an[-1] + slope * min(t - ts[-1], 0.05)
            return an[-1]
        t0, t1 = ts[i - 1], ts[i]
        a0, a1 = an[i - 1], an[i]
        if t1 <= t0:
            return a1
        w = (t - t0) / (t1 - t0)
        return a0 + w * (a1 - a0)
