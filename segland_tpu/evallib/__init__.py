from .infer import Evaluator
from .fuse import fuse_prob_dirs
from .ensemble import EnsembleEvaluator
