from .composite import composite_rays, composite_rays_reference
