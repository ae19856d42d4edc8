from .model_loader import ModelInfo, ModelLoader
from .match_runner import GameConfig, MatchRunner, play_batch_games
from .elo import ELOTracker
from .visualizer import ResultsVisualizer

__all__ = [
    "ModelInfo",
    "ModelLoader",
    "GameConfig",
    "MatchRunner",
    "play_batch_games",
    "ELOTracker",
    "ResultsVisualizer",
]
