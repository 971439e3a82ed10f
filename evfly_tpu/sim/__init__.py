from .obstacles import ObstacleField, generate_forest, load_obstacle_csv, save_obstacle_csv
from .expert import expert_velocity_command
from .dynamics import QuadState, VelocityTrackingQuad
from .rigid_body import QuadrotorParams, RigidBodyQuad
from .evaluator import TrialEvaluator
from .closed_loop import run_trial, rollout_to_trajectory
from .batched import BatchedQuads, run_trials_batched
from .planner import Planner, PlannerExpert
from .launch_evaluation import run_evaluation
from .vision_env import EnvParams, VecVisionEnv

__all__ = [
    "ObstacleField",
    "generate_forest",
    "load_obstacle_csv",
    "save_obstacle_csv",
    "expert_velocity_command",
    "QuadState",
    "VelocityTrackingQuad",
    "RigidBodyQuad",
    "QuadrotorParams",
    "TrialEvaluator",
    "run_trial",
    "rollout_to_trajectory",
    "run_trials_batched",
    "BatchedQuads",
    "Planner",
    "PlannerExpert",
    "run_evaluation",
    "EnvParams",
    "VecVisionEnv",
]
