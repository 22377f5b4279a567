from deadtrees_tpu.ops.augment_pallas import augment_pallas

__all__ = ["augment_pallas"]
