from .alphagrid import AlphaGridSampler, AlphaGridMask
