from .tasks import GraphModel, build_model, init_model, parse_model, yaml_model_load

__all__ = ["GraphModel", "build_model", "init_model", "parse_model", "yaml_model_load"]
