# pgenlibr-compatible R interface over the plink_tpu native codec.
#
# API subset of the upstream pgenlibr package (reference
# 2.0/pgenlibr/R + src/pgenlibr.cpp): NewPgen/NewPvar, counts, buffers,
# ReadHardcalls/Read/ReadList/ReadIntList, Close*.  Biallelic hardcalls
# (dosage/phase tracks are ignored by this edition's reader).

NewPvar <- function(pvar_path) {
  # Pure-R .pvar/.bim parser: keeps the columns the query functions need.
  lines <- readLines(pvar_path)
  body <- lines[!startsWith(lines, "##")]
  header <- body[startsWith(body, "#")]
  body <- body[!startsWith(body, "#")]
  is_bim <- length(header) == 0
  parts <- strsplit(body, "\t", fixed = TRUE)
  if (is_bim) {
    # .bim: CHROM ID CM POS A1 A2
    chrom <- vapply(parts, `[`, "", 1)
    vid <- vapply(parts, `[`, "", 2)
    pos <- as.integer(vapply(parts, `[`, "", 4))
  } else {
    cols <- strsplit(sub("^#", "", header[length(header)]), "\t",
                     fixed = TRUE)[[1]]
    ic <- match("CHROM", cols)
    ii <- match("ID", cols)
    ip <- match("POS", cols)
    chrom <- vapply(parts, `[`, "", ic)
    vid <- vapply(parts, `[`, "", ii)
    pos <- as.integer(vapply(parts, `[`, "", ip))
  }
  structure(list(chrom = chrom, id = vid, pos = pos,
                 variant_ct = length(vid)),
            class = "pgenlibr_pvar")
}

GetVariantCt <- function(pvar_or_pgen) {
  if (inherits(pvar_or_pgen, "pgenlibr_pvar")) {
    return(pvar_or_pgen$variant_ct)
  }
  .Call("rpgen_variant_ct", pvar_or_pgen$ptr)
}

GetVariantId <- function(pvar, variant_num) pvar$id[variant_num]
GetVariantPos <- function(pvar, variant_num) pvar$pos[variant_num]
GetVariantChrom <- function(pvar, variant_num) pvar$chrom[variant_num]
ClosePvar <- function(pvar) invisible(NULL)

NewPgen <- function(pgen_path, pvar = NULL, raw_sample_ct = NULL) {
  hint <- if (is.null(raw_sample_ct)) 0L else as.integer(raw_sample_ct)
  ptr <- .Call("rpgen_open", pgen_path, hint)
  structure(list(ptr = ptr, pvar = pvar), class = "pgenlibr_pgen")
}

GetRawSampleCt <- function(pgen) .Call("rpgen_sample_ct", pgen$ptr)

Buf <- function(pgen) numeric(GetRawSampleCt(pgen))
IntBuf <- function(pgen) integer(GetRawSampleCt(pgen))

ReadHardcalls <- function(pgen, buf, variant_num) {
  m <- .Call("rpgen_read_int", pgen$ptr, as.integer(variant_num))
  if (is.integer(buf)) {
    buf[] <- m[, 1]
  } else {
    buf[] <- as.numeric(m[, 1])
  }
  invisible(buf)
}

Read <- function(pgen, buf, variant_num) {
  m <- .Call("rpgen_read_num", pgen$ptr, as.integer(variant_num), FALSE)
  buf[] <- m[, 1]
  invisible(buf)
}

ReadIntList <- function(pgen, variant_subset) {
  .Call("rpgen_read_int", pgen$ptr, as.integer(variant_subset))
}

ReadList <- function(pgen, variant_subset, meanimpute = FALSE) {
  .Call("rpgen_read_num", pgen$ptr, as.integer(variant_subset),
        isTRUE(meanimpute))
}

ClosePgen <- function(pgen) {
  .Call("rpgen_close", pgen$ptr)
  invisible(NULL)
}
