"""Generic-system DIAL-MPC (the reference's commented-out ROS prototype).

TPU-native rebuild of dial_mpc/src/control_sequence.cpp:52-269 (System /
InvertedPendulum / Cartpole / LeggedRobot) and its cost-based DIAL_MPC loop
(:430-538) — see systems/{base,classic,legged}.py and planner/cost_dial.py.
"""

from tpu_dialmpc.systems.base import System
from tpu_dialmpc.systems.classic import Cartpole, InvertedPendulum
from tpu_dialmpc.systems.legged import LeggedRobot

__all__ = ["System", "InvertedPendulum", "Cartpole", "LeggedRobot"]
