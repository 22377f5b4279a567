from deadtrees_tpu.config.loader import ConfigError, compose, print_config, to_yaml

__all__ = ["ConfigError", "compose", "print_config", "to_yaml"]
