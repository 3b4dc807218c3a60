"""System facade placeholder (full AlvaAR API lands after the frontend)."""

class AlvaAR:  # pragma: no cover - placeholder
    def __init__(self, *a, **k):
        raise NotImplementedError("System facade under construction")
