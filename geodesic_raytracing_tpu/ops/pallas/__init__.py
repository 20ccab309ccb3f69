from .raymarch import trace_rays_pallas

__all__ = ["trace_rays_pallas"]
