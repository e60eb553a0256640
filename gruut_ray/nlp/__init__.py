"""Pure text-processing core (no Ray dependency): tokenizer, fixed-point
normalizer, number/date/time verbalization, SSML subset."""
