"""scikit-image-compatible layer on the TPU-native op suite
(reference cupyimg/skimage, SURVEY.md §2.2)."""
