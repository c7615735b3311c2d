from .presets import ModelConfig, model_config, build_model
