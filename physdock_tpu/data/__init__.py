"""Host-side data layer: featurization, parsers, constants, MSA machinery."""
