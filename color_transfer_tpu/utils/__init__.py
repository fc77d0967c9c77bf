from color_transfer_tpu.utils import visualizations, flow_viz

__all__ = ["visualizations", "flow_viz"]
