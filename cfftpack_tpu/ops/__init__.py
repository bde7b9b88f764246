from .cfft import fft, ifft, fft2, ifft2, fftn, ifftn  # noqa: F401
