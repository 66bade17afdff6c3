from .gmm import GmmModel, run_model
