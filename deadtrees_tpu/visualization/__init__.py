from deadtrees_tpu.visualization.helper import fig2img, show, show_cm

__all__ = ["fig2img", "show", "show_cm"]
