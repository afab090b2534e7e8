"""--help: flag documentation with prefix matching.

Mirrors the role of DispHelp/HelpPrint (2.0/plink2_help.cc:36-45): `--help`
alone prints the grouped flag index; `--help <name>...` prints entries for
every flag matching each name or name prefix.  Descriptions are original
summaries of this engine's behavior (see the per-command docstrings for
the reference citations).
"""

from __future__ import annotations

from .help_data import PLINK2_FLAGS

# flag -> (usage, one-line description).  Grouped roughly like the
# reference's help sections.
HELP: dict[str, tuple[str, str]] = {
    # ---- input ----
    "pfile": ("--pfile <prefix>", "Load a .pgen + .pvar + .psam fileset."),
    "bfile": ("--bfile <prefix>", "Load a PLINK1 .bed + .bim + .fam fileset."),
    "pedmap": ("--pedmap <prefix>", "Load a .ped + .map text fileset."),
    "file": ("--file <prefix>", "Alias of --pedmap."),
    "vcf": ("--vcf <file> [dosage=<field>]",
            "Import a VCF (GT hardcalls incl. multiallelics, phase, "
            "DS/GP/HDS dosage)."),
    "bcf": ("--bcf <file> [dosage=<field>]", "Import a BCF2 file."),
    "bgen": ("--bgen <file> [snpid-chr] ['ref-first'|'ref-last']",
             "Import a BGEN 1.1/1.2/1.3 file."),
    "gen": ("--gen <file> ['ref-first'|'ref-last'|'ref-unknown']",
            "Import an Oxford .gen file (with --sample)."),
    "data": ("--data <prefix>", "Import Oxford .gen + .sample by prefix."),
    "sample": ("--sample <file>", "Oxford .sample file for --gen/--haps."),
    "tped": ("--tped <file>", "Import transposed .tped (with --tfam)."),
    "tfam": ("--tfam <file>", "Sample file for --tped."),
    "eigfile": ("--eigfile <prefix>", "Import an Eigensoft geno/ind/snp set."),
    "dummy": ("--dummy <sample-ct> <variant-ct> [missing-freq] ...",
              "Generate a random test fileset."),
    "seed": ("--seed <n>", "Seed the random number generator."),
    # ---- output / runtime ----
    "out": ("--out <prefix>", "Output file name prefix (default 'plink2')."),
    "silent": ("--silent", "Suppress console output (log file still written)."),
    "threads": ("--threads <n>", "Maximum host thread count."),
    "memory": ("--memory <MiB>", "Host memory budget hint."),
    "parallel": ("--parallel <k> <n>",
                 "Compute piece k of n for sharded matrix jobs "
                 "(output-compatible with plink2's manual sharding)."),
    # ---- sample filters ----
    "keep": ("--keep <file>", "Keep only samples listed by ID."),
    "remove": ("--remove <file>", "Remove samples listed by ID."),
    "keep_if": ("--keep-if <expr>", "Keep samples satisfying a phenotype/"
                "covariate comparison expression."),
    "remove_if": ("--remove-if <expr>", "Remove samples satisfying an "
                  "expression."),
    "keep_cats": ("--keep-cats <file>", "Keep samples in listed categories."),
    "keep_cat_names": ("--keep-cat-names <name>...",
                       "Keep samples with the named categories."),
    "keep_cat_pheno": ("--keep-cat-pheno <pheno>",
                       "Categorical phenotype for --keep-cats/--keep-cat-names."),
    "remove_cats": ("--remove-cats <file>", "Remove listed categories."),
    "remove_cat_names": ("--remove-cat-names <name>...",
                         "Remove samples with the named categories."),
    "remove_cat_pheno": ("--remove-cat-pheno <pheno>",
                         "Categorical phenotype for --remove-cats."),
    "keep_males": ("--keep-males", "Keep male samples only."),
    "keep_females": ("--keep-females", "Keep female samples only."),
    "keep_founders": ("--keep-founders", "Keep founders only."),
    "keep_nonfounders": ("--keep-nonfounders", "Keep nonfounders only."),
    "mind": ("--mind <rate>", "Drop samples with missing call rate above "
             "the threshold."),
    # ---- variant filters ----
    "extract": ("--extract ['bed0'|'bed1'|'range'] <file>...",
                "Keep variants by ID list or interval file."),
    "exclude": ("--exclude ['bed0'|'bed1'|'range'] <file>...",
                "Remove variants by ID list or interval file."),
    "extract_intersect": ("--extract-intersect <file>...",
                          "Keep variants present in every listed file."),
    "snp": ("--snp <id>", "Keep one variant (with --window: its neighborhood)."),
    "snps": ("--snps <id ranges>", "Keep listed variant IDs/ranges."),
    "exclude_snp": ("--exclude-snp <id>", "Remove one variant."),
    "exclude_snps": ("--exclude-snps <id ranges>", "Remove listed variants."),
    "window": ("--window <kb>", "Window size around --snp."),
    "from": ("--from <id>", "Keep variants from this ID onward (one chrom)."),
    "to": ("--to <id>", "Keep variants up to this ID."),
    "from_bp": ("--from-bp <pos>", "Keep variants at or after this position."),
    "to_bp": ("--to-bp <pos>", "Keep variants at or before this position."),
    "chr": ("--chr <chrom>...", "Keep variants on the listed chromosomes."),
    "not_chr": ("--not-chr <chrom>...", "Remove variants on the listed "
                "chromosomes."),
    "autosome": ("--autosome", "Keep autosomal variants only."),
    "snps_only": ("--snps-only ['just-acgt']", "Keep single-nucleotide "
                  "variants only."),
    "geno": ("--geno <rate>", "Drop variants with missing call rate above "
             "the threshold."),
    "maf": ("--maf <freq>", "Drop variants with minor allele frequency "
            "below the threshold."),
    "max_maf": ("--max-maf <freq>", "Drop variants with MAF above the "
                "threshold."),
    "mac": ("--mac <ct>", "Minor allele count lower bound."),
    "max_mac": ("--max-mac <ct>", "Minor allele count upper bound."),
    "hwe": ("--hwe <p> ['midp']", "Drop variants failing the Hardy-Weinberg "
            "exact test at the given p-value."),
    "thin": ("--thin <rate>", "Randomly keep a fraction of variants."),
    "thin_count": ("--thin-count <n>", "Randomly keep n variants."),
    "rm_dup": ("--rm-dup [mode]", "Deduplicate same-position/allele "
               "variants (error/retain-mismatch/exclude-mismatch/force-first)."),
    "nonfounders": ("--nonfounders", "Use all samples (not just founders) "
                    "for frequency computations."),
    # ---- metadata edits ----
    "set_all_var_ids": ("--set-all-var-ids <template>",
                        "Rewrite every variant ID from a @/#/$r/$a template."),
    "set_missing_var_ids": ("--set-missing-var-ids <template>",
                            "Rewrite '.' variant IDs from a template."),
    "update_name": ("--update-name <file> [new-col] [old-col] [skip]",
                    "Rename variant IDs from a mapping file."),
    "update_map": ("--update-map <file> [bp-col] [id-col] [skip]",
                   "Update variant positions."),
    "update_alleles": ("--update-alleles <file>", "Update allele codes."),
    "no_snp": ("--no-snp",
               "One-off covariate-only --linear/--logistic regression."),
    "allele1234": ("--allele1234 [multichar]",
                   "Translate A/C/G/T allele codes to 1/2/3/4."),
    "alleleACGT": ("--alleleACGT [multichar]",
                   "Translate 1/2/3/4 allele codes to A/C/G/T."),
    "update_ids": ("--update-ids <file>", "Update sample IDs."),
    "update_parents": ("--update-parents <file>", "Update parental IDs."),
    "update_sex": ("--update-sex <file> ['col-num='<n>]",
                   "Update sample sexes."),
    "ref_allele": ("--ref-allele [force] <file> [cols...]",
                   "Set REF alleles from a file."),
    "alt_allele": ("--alt-allele [force] <file> [cols...]",
                   "Set ALT1 alleles from a file."),
    "maj_ref": ("--maj-ref [force]", "Set REF to the major allele."),
    "fa": ("--fa <fasta>", "Reference FASTA for --ref-from-fa/--normalize."),
    "ref_from_fa": ("--ref-from-fa [force]",
                    "Set REF alleles from the --fa reference."),
    "normalize": ("--normalize", "Left-align and trim indels against --fa."),
    "sort_vars": ("--sort-vars", "Sort variants by chromosome and position."),
    "indiv_sort": ("--indiv-sort <mode> [file]", "Sort samples for "
                   "--make-pgen (natural/ascii/none/file)."),
    "recover_var_ids": ("--recover-var-ids <file> [modifiers]",
                        "Restore variant IDs matching on position+alleles."),
    # ---- commands: reports ----
    "freq": ("--freq ['counts']", "Write allele frequencies (.afreq)."),
    "missing": ("--missing ['variant-only'|'sample-only']",
                "Write missingness reports (.vmiss/.smiss)."),
    "hardy": ("--hardy ['midp']", "Write Hardy-Weinberg exact test results "
              "(.hardy; chrX uses the Graffelman-Weir test)."),
    "geno_counts": ("--geno-counts", "Write genotype count report (.gcount)."),
    "het": ("--het [small-sample]", "Write observed/expected "
            "heterozygosity (.het); small-sample = founder-count-based "
            "E(HET) correction."),
    "sample_counts": ("--sample-counts", "Write per-sample genotype class "
                      "counts (.scount)."),
    "fst": ("--fst <pheno> [method=] [report-variants]",
            "Hudson/Weir-Cockerham Fst between sample groups."),
    "check_sex": ("--check-sex [fthresh] [mthresh]",
                  "Compare reported sex against X-heterozygosity."),
    "impute_sex": ("--impute-sex [fthresh] [mthresh]",
                   "Overwrite sex from X-heterozygosity."),
    "mendel": ("--mendel", "Write Mendel error reports for trios."),
    "me_report": ("--me <t> <v>", "Mendel-error-rate filtering thresholds."),
    "sdiff": ("--sample-diff <ids...>", "Pairwise sample discordance "
              "report."),
    "sample_diff": ("--sample-diff <ids...>", "Alias of --sdiff."),
    "genotyping_rate": ("--genotyping-rate ['dosage']",
                        "Log the total genotyping rate."),
    "write_snplist": ("--write-snplist ['zs']", "Write surviving variant "
                      "IDs."),
    "write_samples": ("--write-samples", "Write surviving sample IDs."),
    "validate": ("--validate", "Verify .pgen structural integrity."),
    "pgen_info": ("--pgen-info", "Print .pgen header information."),
    # ---- data generation ----
    "make_pgen": ("--make-pgen", "Write a new .pgen + .pvar + .psam."),
    "make_bed": ("--make-bed", "Write a PLINK1 .bed + .bim + .fam."),
    "make_just_pvar": ("--make-just-pvar", "Write .pvar only."),
    "make_just_psam": ("--make-just-psam", "Write .psam only."),
    "export": ("--export <format...>",
               "Export to vcf/bgen/oxford/ped/tped/A/AD/Av/haps and more."),
    "pmerge": ("--pmerge <prefix>", "Merge two filesets (concatenating)."),
    "pmerge_list": ("--pmerge-list <file>", "Merge many filesets."),
    "pgen_diff": ("--pgen-diff <prefix>", "Report genotype differences "
                  "between two filesets."),
    # ---- relationship / matrices ----
    "make_king": ("--make-king [square|square0|triangle] [bin|bin4]",
                  "KING-robust kinship matrix (MXU plane-Gram kernel)."),
    "make_king_table": ("--make-king-table ['counts']",
                        "KING kinship table (.kin0)."),
    "king_table_filter": ("--king-table-filter <min>",
                          "Drop .kin0 rows below a kinship threshold "
                          "(evaluated on-device; enables biobank-scale "
                          "tables)."),
    "king_table_subset": ("--king-table-subset <file>",
                          "Compute KING for listed sample pairs only."),
    "king_cutoff": ("--king-cutoff [prefix] <threshold>",
                    "Greedily prune one of each sample pair above the "
                    "kinship threshold."),
    "make_grm_bin": ("--make-grm-bin", "GCTA-format GRM (.grm.bin)."),
    "make_grm_list": ("--make-grm-list", "Text GRM (.grm)."),
    "make_rel": ("--make-rel [shape]", "Relationship matrix (.rel)."),
    "pca": ("--pca [ct] ['approx'] ['allele-wts']",
            "Principal components (exact eigh or randomized power "
            "iteration on streamed MXU matmuls)."),
    "pheno_svd": ("--pheno-svd <ct>", "Replace phenotypes with their top "
                  "singular vectors."),
    # ---- LD ----
    "indep_pairwise": ("--indep-pairwise <ct|kb> [step] <r2>",
                       "Greedy windowed LD pruning (banded plane-Gram r2)."),
    "indep_pairphase": ("--indep-pairphase <ct|kb> [step] <r2>",
                        "LD pruning on phased haplotypes."),
    "r_phased": ("--r-phased [cols...]", "Phased LD table (r)."),
    "r_unphased": ("--r-unphased [cols...]", "Unphased LD table (r)."),
    "r2_phased": ("--r2-phased [cols...]", "Phased LD table (r^2)."),
    "r2_unphased": ("--r2-unphased [cols...]", "Unphased LD table (r^2)."),
    "ld_window_kb": ("--ld-window-kb <kb>", "LD table window size."),
    "ld_window_r2": ("--ld-window-r2 <r2>", "LD table r^2 cutoff."),
    "ld": ("--ld <id1> <id2>", "Console LD report for one variant pair."),
    "clump": ("--clump <file>...", "LD-based result clumping."),
    "clump_p1": ("--clump-p1 <p>", "Index variant p-value threshold."),
    "clump_p2": ("--clump-p2 <p>", "Clumped variant p-value threshold."),
    "clump_r2": ("--clump-r2 <r2>", "Clumping r^2 threshold."),
    "clump_kb": ("--clump-kb <kb>", "Clumping window."),
    # ---- association ----
    "glm": ("--glm [modifiers...]",
            "Linear/logistic/Firth regression per variant (batched IRLS on "
            "the MXU; supports genotypic/hethom/dominant/recessive/hetonly, "
            "interaction, aperm/mperm permutation, chrX/chrY handling)."),
    "condition": ("--condition <id> ['dominant'|'recessive']",
                  "Add one variant's dosage as a covariate."),
    "condition_list": ("--condition-list <file>",
                       "Add listed variants as covariates."),
    "covar": ("--covar <file>", "Covariate file for --glm."),
    "covar_name": ("--covar-name <names...>", "Select covariates by name."),
    "covar_variance_standardize": ("--covar-variance-standardize",
                                   "Standardize covariates to unit variance."),
    "pheno": ("--pheno <file>", "Phenotype file."),
    "pheno_name": ("--pheno-name <names...>", "Select phenotypes by name."),
    "quantile_normalize": ("--quantile-normalize",
                           "Quantile-normalize quantitative phenotypes."),
    "xchr_model": ("--xchr-model <0|2>", "chrX genotype coding in --glm "
                   "(0 = skip chrX; 2 = 0..2 dosage, default)."),
    "aperm": ("--aperm <min> [max] [alpha] [beta] [init] [slope]",
              "Adaptive permutation parameters for --glm aperm."),
    "adjust": ("--adjust ['zs'] [cols...]", "Multiple-testing corrections "
               "for --glm results."),
    "adjust_file": ("--adjust-file <file> [test=<name>]",
                    "Multiple-testing corrections for an existing file."),
    "gwas_ssf": ("--gwas-ssf [modifiers]", "GWAS-SSF formatted summary "
                 "statistics from --glm output."),
    # ---- scoring ----
    "score": ("--score <file> [i j k] [modifiers]",
              "Polygenic score from per-allele weights."),
    "score_list": ("--score-list <file> ...", "Multiple score files."),
    "score_col_nums": ("--score-col-nums <ranges>", "Score value columns."),
    "q_score_range": ("--q-score-range <range-file> <data-file> [i j]",
                      "Stratified scoring by p-value range."),
    "variant_score": ("--variant-score <file> [cols]",
                      "Per-variant dot products against sample weights "
                      "(.vscore)."),
    "vscore_col_nums": ("--vscore-col-nums <ranges>",
                        "Columns for --variant-score."),
    "read_freq": ("--read-freq <file>", "Load allele frequencies from a "
                  "prior --freq run."),
    # ---- misc ----
    "king_cutoff_prefix": ("--king-cutoff <prefix> <t>",
                           "Resume --king-cutoff from saved .king.bin."),
    "hard_call_threshold": ("--hard-call-threshold <val>",
                            "Dosage-to-hardcall rounding threshold."),
    "dosage_erase_threshold": ("--dosage-erase-threshold <val>",
                               "Erase dosages close to hardcalls."),
    "import_dosage_certainty": ("--import-dosage-certainty <val>",
                                "Minimum probability to import a dosage."),
    "vcf_min_gq": ("--vcf-min-gq <n>", "Treat VCF calls below GQ as missing."),
    "vcf_min_dp": ("--vcf-min-dp <n>", "Treat VCF calls below DP as missing."),
    "vcf_max_dp": ("--vcf-max-dp <n>", "Treat VCF calls above DP as missing."),
    "vcf_half_call": ("--vcf-half-call <mode>",
                      "How to handle VCF half-calls "
                      "(error/haploid/missing/reference)."),
    # ---- PLINK 1.9 analyses ----
    "assoc": ("--assoc ['counts'|'fisher']",
              "1.9 case/control allelic association (.assoc)."),
    "model": ("--model ['fisher'|'trend-only'|...]",
              "1.9 genotypic association table (.model)."),
    "genome": ("--genome ['gz'|'full'|'unbounded'|'nudge']",
               "1.9 IBS/IBD pairwise estimates incl. PI_HAT (.genome)."),
    "distance": ("--distance ['square'|'triangle'|'ibs'|'1-ibs'|...]",
                 "1.9 IBS-based distance matrices."),
    "distance_matrix": ("--distance-matrix",
                        "1.9 plink1-style .mdist matrix."),
    "ibs_matrix": ("--ibs-matrix", "1.9 plink1-style .mibs matrix."),
    "cluster": ("--cluster ['cc'|'group-avg'|'missing'|'only2']",
                "1.9 complete-linkage IBS clustering."),
    "neighbour": ("--neighbour <n1> <n2>",
                  "1.9 nearest-neighbor outlier report (.nearest)."),
    "mds_plot": ("--mds-plot <dims> ['by-cluster'|'eigendecomp'|'eigvals']",
                 "1.9 multidimensional scaling coordinates (.mds)."),
    "ppc_gap": ("--ppc-gap <kb>", "Gap between informative PPC-test pairs."),
    "homozyg": ("--homozyg ['extend'|'subtract-1-from-lengths']",
                "1.9 run-of-homozygosity scan (.hom/.hom.indiv/"
                ".hom.summary)."),
    "homozyg_snp": ("--homozyg-snp <n>", "Minimum ROH length in markers."),
    "homozyg_kb": ("--homozyg-kb <kb>", "Minimum ROH length in kilobases."),
    "homozyg_density": ("--homozyg-density <kb/snp>",
                        "Maximum average marker spacing inside an ROH."),
    "homozyg_gap": ("--homozyg-gap <kb>",
                    "Maximum gap between consecutive ROH markers."),
    "homozyg_het": ("--homozyg-het <n>",
                    "Maximum heterozygote calls inside an ROH."),
    "homozyg_window_snp": ("--homozyg-window-snp <n>",
                           "Scanning window size in markers."),
    "homozyg_window_het": ("--homozyg-window-het <n>",
                           "Max hets in a hit window."),
    "homozyg_window_missing": ("--homozyg-window-missing <n>",
                               "Max missing calls in a hit window."),
    "homozyg_window_threshold": ("--homozyg-window-threshold <frac>",
                                 "Min hit-window fraction per marker."),
}


def _all_flag_names() -> list[str]:
    return sorted(HELP)


def print_help(args: list[str]) -> int:
    """--help [flag-or-prefix ...]"""
    if not args:
        print("plink-tpu: TPU-native GWAS engine (plink2-compatible CLI)\n")
        print("Implemented flags (--help <name> for details):\n")
        names = ["--" + n.replace("_", "-") for n in _all_flag_names()]
        width = max(len(n) for n in names) + 2
        per = max(1, 78 // width)
        for i in range(0, len(names), per):
            print("  " + "".join(n.ljust(width) for n in names[i : i + per]))
        print(
            "\nplink2 flags not listed above are recognized but not "
            "implemented yet;\nthe parser reports them distinctly from "
            "unknown flags."
        )
        return 0
    rc = 0
    for a in args:
        key = a.lstrip("-").replace("-", "_")
        exact = HELP.get(key)
        matches = (
            [(key, exact)] if exact
            else [(k, HELP[k]) for k in _all_flag_names()
                  if k.startswith(key)]
        )
        if not matches:
            ref = a.lstrip("-")
            if ref in PLINK2_FLAGS or ref.replace("_", "-") in PLINK2_FLAGS:
                print(f"--{ref}: recognized plink2 flag, not implemented in "
                      "plink-tpu yet.")
            else:
                print(f"--{ref}: unknown flag.")
                rc = 1
            continue
        for k, (usage, desc) in matches:
            print(usage)
            print("  " + desc)
    return rc
