"""Host-side data layer: NIfTI IO, dataset discovery, preprocessing
transforms, fold splits, async device-feeding pipeline, synthetic fixtures."""
