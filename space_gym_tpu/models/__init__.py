"""On-device learners (SAC / TD3 / DQN / PPO) and their building blocks."""
from .networks import DeterministicActor, DoubleCritic, MLP, TanhGaussianActor  # noqa: F401
from .replay import ReplayState, Transition, replay_add, replay_add_slab, replay_init, replay_sample  # noqa: F401
from .dqn import DQNConfig, DQNState, DQNTrainer  # noqa: F401
from .sac import SACConfig, SACState, SACTrainer  # noqa: F401
from .td3 import TD3Config, TD3State, TD3Trainer  # noqa: F401
from .ppo import PPOConfig, PPOState, PPOTrainer  # noqa: F401
