from .geocoder import CachedGeocoder, Feature, Geocoder

__all__ = ["CachedGeocoder", "Feature", "Geocoder"]
